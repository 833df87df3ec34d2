#!/bin/bash
# Small arm of the device-resident recipe A/B, checkpointing every 10 epochs
# (per-epoch orbax saves cost ~8-9 s wall each on the 1-core host — cadence
# does not affect numerics, only wall time).
set -x
cd /root/repo
timeout 3000 python train.py fit --config configs/synth_hard_dev.yaml \
    --config configs/small.yaml \
    --set train.epochs=100 --set runtime.out_dir=runs/ab_dev_small \
    --set runtime.checkpoint_every_epochs=10 \
    > /tmp/ab_dev_small.log 2>&1
echo "SMALL_ARM_EXIT=$?"
cp runs/ab_dev_small/metrics.jsonl artifacts/ab_dev_small_metrics.jsonl
echo "SMALL_DONE"
