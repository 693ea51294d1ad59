#!/bin/bash
# Round-3 SAM A/B batch 2: stream pipelining, ViT bf16 residual fix,
# upscale split-chain, window repartition. All cells crop_n_layers=1,
# exact stability, gate on (defaults).
set -x
cd /root/repo
export BENCH_SAM_ITERS=3

echo "=== HEAD: stream (default) ==="
timeout 1800 python bench_sam.py
echo "=== no-stream floor ==="
BENCH_SAM_NO_STREAM=1 timeout 1800 python bench_sam.py
echo "=== stream + upscale split 2 ==="
REGDA_UPSCALE_SPLIT=2 timeout 1800 python bench_sam.py
echo "=== stream + upscale split 4 ==="
REGDA_UPSCALE_SPLIT=4 timeout 1800 python bench_sam.py
echo "=== stream + window repartition ==="
REGDA_VIT_WINDOW_REPARTITION=1 timeout 1800 python bench_sam.py
echo "=== stream + mono-blocked pp=1 ==="
REGDA_MONO_DECODE=1 REGDA_MONO_PP=1 timeout 1800 python bench_sam.py
echo "=== stream + mono-blocked pp=2 ==="
REGDA_MONO_DECODE=1 REGDA_MONO_PP=2 timeout 1800 python bench_sam.py
echo "=== phase breakdown at HEAD ==="
timeout 1200 python tools/bench_sam_phases.py --encode-layers --iters 10 --crops 5
echo "=== bench_sam_r3b done ==="
