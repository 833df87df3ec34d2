#!/bin/bash
# Round-4 TPU work queue — run top to bottom once the tunnel is alive.
# Each step owns the chip alone (the tunnel multiplexes, CLAUDE.md).
set -x

# 0. health gate: relay + fresh compile + sustained throughput
python scripts/probe_tpu.py || exit 1

# 1. batched serving curve (verdict #4) + int8 re-test
timeout 5400 python scripts/bench_serving.py \
    --models cspdarknet53,vit_b_16,swin_t,efficientnet_b0
timeout 3000 python scripts/bench_serving.py --models vit_b_16,deit3_s_16 \
    --int8 --batches 32,128 --out artifacts/serving_int8.json

# 2. 100-epoch recipe A/B on the hard corpus (verdict #5); corpus must exist
#    (scripts/make_synth_dataset_v2.py --root /tmp/vtt_synth_hard)
timeout 14400 python train.py fit --config configs/synth_hard.yaml \
    --set train.epochs=100 --set runtime.out_dir=runs/synth_hard_100_full
timeout 14400 python train.py fit --config configs/synth_hard.yaml \
    --config configs/small.yaml \
    --set train.epochs=100 --set runtime.out_dir=runs/synth_hard_100_small

# 2b. convnext_t infer phase evidence (verdict weak #3, unfinished half)
timeout 1800 python scripts/analyze_swin_bytes.py --model convnext_t --infer
timeout 1800 python scripts/analyze_swin_bytes.py --model convnext_t

# 2c. swin shifted-window relayout kernel A/B (ops/swin_relayout.py) —
#     if positive, set _ENABLED=True in the module and record in BENCHMARKS.md
timeout 3000 python scripts/measure_swin_relayout.py

# 2d. ViT-L hidden-split fused-MLP chain + head-split attention chain A/B
#     (ops/block_mlp.py, ops/block_attention.py) — flip _ALLOW_HIDDEN_SPLIT
#     and/or _ALLOW_HEAD_SPLIT per the winning arms (the script's attn/mlp/
#     both arms attribute the delta per kernel) and record in BENCHMARKS.md
timeout 3000 python scripts/measure_block_kernels.py --models vit_l_16

# 3. end-of-round refresh: per-model sweep + roofline + headline bench
timeout 7200 python scripts/benchmark_models.py
timeout 7200 python scripts/roofline.py
timeout 1200 python bench.py
