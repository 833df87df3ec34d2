#!/bin/bash
# Round-5: the 100-epoch full-vs-small recipe A/B, device-resident arms
# (VERDICT.md round-4 item 1; ref README.md:81-97 recipe semantics).
#
# Why device-resident: the host-fed arms run ~400 img/s (tunnel H2D binds,
# artifacts/duty_cycle.json) so one arm costs ~50 min of chip; the HBM-store
# + on-device-RRC path (configs/synth_hard_dev.yaml) runs at chip rate and
# both arms finish inside the round. The prior host-fed attempt completed
# the FULL arm only (epoch 99 val/acc 0.7573, artifacts/
# synth_hard_100_full_metrics.jsonl); re-running BOTH arms on one input
# path keeps the comparison self-consistent.
set -x
cd /root/repo

# pre-decode the (regenerated) hard corpus into raw-crop shards
python scripts/make_raw_shards.py --src /tmp/vtt_synth_hard/train \
    --out /tmp/vtt_synth_hard_raw/train --store 200 --per-shard 6000
python scripts/make_raw_shards.py --src /tmp/vtt_synth_hard/val \
    --out /tmp/vtt_synth_hard_raw/val --store 224

timeout 3000 python train.py fit --config configs/synth_hard_dev.yaml \
    --set train.epochs=100 --set runtime.out_dir=runs/ab_dev_full \
    > /tmp/ab_dev_full.log 2>&1
echo "FULL_ARM_EXIT=$?"

timeout 3000 python train.py fit --config configs/synth_hard_dev.yaml \
    --config configs/small.yaml \
    --set train.epochs=100 --set runtime.out_dir=runs/ab_dev_small \
    > /tmp/ab_dev_small.log 2>&1
echo "SMALL_ARM_EXIT=$?"

cp runs/ab_dev_full/metrics.jsonl artifacts/ab_dev_full_metrics.jsonl
cp runs/ab_dev_small/metrics.jsonl artifacts/ab_dev_small_metrics.jsonl
echo "AB_DEV_DONE"
