#!/bin/bash
# On-chip A/B matrix for the round-2 SAM decode kernels (run on the real
# TPU when the tunnel is up; each cell is one bench_sam.py run at the
# reference-parity crop_n_layers=1 configuration).
#
#   bash runs/bench_mono_ab.sh [logfile]
#
# Matrix: two-step (baseline) vs monolithic decode kernel at 1/2/4
# prompts per program, plus the per-prompt IoU gate (REGDA_SAM_IOU_GATE;
# NOTE: random-init weights fail pred_iou_thresh almost everywhere, so
# the gated numbers OVERSTATE the real-weight gain — record them as a
# ceiling, not a claim). Finishes with crop0 and the kernel parity check.
set -u
LOG="${1:-/tmp/bench_mono_ab.log}"
cd "$(dirname "$0")/.."

run() {
  local label="$1"; shift
  echo "=== $label [$*]" | tee -a "$LOG"
  env "$@" timeout 2400 python bench_sam.py 2>&1 | tail -1 | tee -a "$LOG"
}

: > "$LOG"
echo "=== seg-infer bench (driver metric)" | tee -a "$LOG"
timeout 2400 python bench.py 2>&1 | tail -1 | tee -a "$LOG"

run "two-step (current default)"      REGDA_NO_MONO=1
run "mono pp=1"                       REGDA_MONO_DECODE=1 REGDA_MONO_PP=1
run "mono pp=2 (default)"             REGDA_MONO_DECODE=1
run "mono pp=4"                       REGDA_MONO_DECODE=1 REGDA_MONO_PP=4
run "mono pp=2 + iou gate (ceiling)"  REGDA_MONO_DECODE=1 REGDA_SAM_IOU_GATE=1
run "two-step + iou gate (ceiling)"   REGDA_NO_MONO=1 REGDA_SAM_IOU_GATE=1
run "crop0 two-step"                  REGDA_NO_MONO=1 BENCH_SAM_CROPS=0
run "crop0 mono pp=2"                 REGDA_MONO_DECODE=1 BENCH_SAM_CROPS=0

echo "=== kernel parity on chip" | tee -a "$LOG"
timeout 2400 python tools/check_kernels.py --quick 2>&1 | tail -2 | tee -a "$LOG"
echo "done; full log at $LOG"
