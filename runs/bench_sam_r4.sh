#!/bin/bash
# Round-4 SAM bench matrix (run on the real TPU). All cells
# crop_n_layers=1, exact stability, IoU gate on (defaults) unless
# flagged. The round-4 decode decision (mono/factored/ln_project deleted,
# two-step + per-block window repartition defaults) was made from the
# cells recorded in PERF.md's round-4 section.
set -x
cd /root/repo
export BENCH_SAM_ITERS=3

echo "=== HEAD (defaults) ==="
timeout 1800 python bench_sam.py
echo "=== persistent windowed layout (loser, for reference) ==="
REGDA_VIT_WINDOW_PERSISTENT=1 timeout 1800 python bench_sam.py
echo "=== fast (low-res) stability ==="
REGDA_SAM_FAST_STABILITY=1 timeout 1800 python bench_sam.py
echo "=== iou gate off ==="
REGDA_SAM_NO_IOU_GATE=1 timeout 1800 python bench_sam.py
echo "=== crop0 ==="
BENCH_SAM_CROPS=0 timeout 1800 python bench_sam.py
echo "=== kernel parity ==="
timeout 2400 python tools/check_kernels.py --quick 2>&1 | tail -2
echo "=== phase + encoder-layer breakdowns ==="
timeout 1800 python tools/bench_sam_phases.py --iters 10
timeout 1200 python tools/bench_sam_phases.py --encode-layers --iters 10
