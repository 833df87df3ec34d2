#!/bin/bash
# Round-5 TPU work queue (post recipe-A/B). Each step owns the chip alone
# (the tunnel multiplexes, CLAUDE.md). Gate with probe_tpu before each
# long-running step; re-probe between steps if numbers look drifted.
set -x
cd /root/repo

# 0. health gate
python scripts/probe_tpu.py || exit 1

# 1. roofline + byte-bucket refresh at HEAD (verdict item 3) — kernels +
#    split chains + save-free inference are now ON; the table must describe
#    shipping dispatch. Includes the new vit_l bs32 and vit_h bs8 rows.
timeout 7200 python scripts/roofline.py

# 2. convnext_t infer phase accounting (verdict item 6)
timeout 1800 python scripts/analyze_swin_bytes.py --model convnext_t --infer
timeout 1800 python scripts/analyze_swin_bytes.py --model convnext_t

# 3. swin_t bs128 serving cliff diagnosis (verdict item 4)
timeout 3600 python scripts/diagnose_swin_serving.py

# 4. big-model story (verdict item 5): fresh-process vit_l + first vit_h rows
timeout 3600 python scripts/benchmark_models.py --models vit_l_16,vit_h_14 \
    --out artifacts/bench_vit_lh.md
#    vit_h block-kernel A/B (MLP hidden-split; attention on XLA)
timeout 3000 python scripts/measure_block_kernels.py --models vit_h_14
#    vit_h ns=2 attention beyond-budget experiment (12.9 MiB est vs 12 MiB
#    gate) — record positive or the Mosaic failure as the measured negative
timeout 3000 python scripts/measure_block_kernels.py --models vit_h_14 \
    --attn-budget-mib 14

# 5. aug overhead attribution (verdict item 8)
timeout 2400 python scripts/measure_aug_ablation.py

# 5b. input story (verdict item 2): overlapped duty cycle — synth / raw /
#     native-jpeg / device-resident legs + the H2D link rate that binds the
#     host-fed loaders in this environment
timeout 1800 python scripts/measure_duty_cycle.py --steps 40 --batch 256
#     clean decode-scaling re-run (the committed artifact was taken while the
#     suite was hogging the 1-core host)
timeout 900 python scripts/bench_decode_scaling.py --threads 1,2 --secs 4 --wds --raw

# 6. end-of-round refresh: full sweep + headline bench
timeout 7200 python scripts/benchmark_models.py --out artifacts/bench_models_r5.md
timeout 1200 python bench.py
