#!/bin/bash
# Round-5: resume the interrupted 100-epoch full-vs-small recipe A/B
# (VERDICT.md item 1). The first attempt was killed at full-arm epoch 43 /
# small-arm epoch 41; the fit loop now continues the epoch count from the
# restored optimizer step, so each arm runs only its remaining epochs.
# Arms run sequentially — each owns the chip alone (the tunnel multiplexes).
set -x
cd /root/repo

latest() { ls "$1"/checkpoints | sort -t_ -k2 -n | tail -1; }

FULL_DIR=runs/synth_hard_100_full
SMALL_DIR=runs/synth_hard_100_small

timeout 14400 python train.py fit --config configs/synth_hard.yaml \
    --set train.epochs=100 --set runtime.out_dir=$FULL_DIR \
    --set runtime.resume=$FULL_DIR/checkpoints/$(latest $FULL_DIR) \
    > /tmp/ab_full_resume.log 2>&1
echo "FULL_ARM_EXIT=$?"

timeout 14400 python train.py fit --config configs/synth_hard.yaml \
    --config configs/small.yaml \
    --set train.epochs=100 --set runtime.out_dir=$SMALL_DIR \
    --set runtime.resume=$SMALL_DIR/checkpoints/$(latest $SMALL_DIR) \
    > /tmp/ab_small_resume.log 2>&1
echo "SMALL_ARM_EXIT=$?"

cp $FULL_DIR/metrics.jsonl artifacts/synth_hard_100_full_metrics.jsonl
cp $SMALL_DIR/metrics.jsonl artifacts/synth_hard_100_small_metrics.jsonl
echo "AB_DONE"
