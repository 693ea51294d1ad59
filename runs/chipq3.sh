#!/bin/bash
# Round-3 chip batch 3: kernel parity for the new stability variants,
# the stability kernel sweep (interleaved/blocked/v2 x group x dense),
# the budget-skip A/B, and the carried-over r3b decode matrix.
# All bench cells crop_n_layers=1, exact stability, gate on (defaults).
set -x
cd /root/repo
export BENCH_SAM_ITERS=3

echo "=== kernel parity (incl. blocked v2 + dense) ==="
timeout 2400 python tools/check_kernels.py --quick
echo "=== stability kernel sweep ==="
timeout 2400 python tools/bench_sam_phases.py --stability --iters 10
echo "=== HEAD: stream + budget-skip (default) ==="
timeout 1800 python bench_sam.py
echo "=== budget-skip off floor ==="
REGDA_NO_BUDGET_SKIP=1 timeout 1800 python bench_sam.py
echo "=== no-stream floor ==="
BENCH_SAM_NO_STREAM=1 timeout 1800 python bench_sam.py
echo "=== stream + upscale split 2 ==="
REGDA_UPSCALE_SPLIT=2 timeout 1800 python bench_sam.py
echo "=== stream + window repartition ==="
REGDA_VIT_WINDOW_REPARTITION=1 timeout 1800 python bench_sam.py
echo "=== stream + mono-blocked pp=1 ==="
REGDA_MONO_DECODE=1 REGDA_MONO_PP=1 timeout 1800 python bench_sam.py
echo "=== stream + mono-blocked pp=2 ==="
REGDA_MONO_DECODE=1 REGDA_MONO_PP=2 timeout 1800 python bench_sam.py
echo "=== phase breakdown at HEAD ==="
timeout 1200 python tools/bench_sam_phases.py --encode-layers --iters 10 --crops 5
timeout 1800 python tools/bench_sam_phases.py --iters 10 --crops 5
echo "=== chipq3 done ==="
