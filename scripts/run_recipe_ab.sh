#!/bin/bash
# Round-5: the twice-queued 100-epoch full-vs-small recipe A/B
# (VERDICT.md item 1; ref README.md:81-97 recipe semantics).
# Runs both arms sequentially — each arm owns the chip alone.
set -x
cd /root/repo

timeout 14400 python train.py fit --config configs/synth_hard.yaml \
    --set train.epochs=100 --set runtime.out_dir=runs/synth_hard_100_full \
    > /tmp/ab_full.log 2>&1
echo "FULL_ARM_EXIT=$?"

timeout 14400 python train.py fit --config configs/synth_hard.yaml \
    --config configs/small.yaml \
    --set train.epochs=100 --set runtime.out_dir=runs/synth_hard_100_small \
    > /tmp/ab_small.log 2>&1
echo "SMALL_ARM_EXIT=$?"

cp runs/synth_hard_100_full/metrics.jsonl artifacts/synth_hard_100_full_metrics.jsonl 2>/dev/null
cp runs/synth_hard_100_small/metrics.jsonl artifacts/synth_hard_100_small_metrics.jsonl 2>/dev/null
echo "AB_DONE"
