#!/bin/bash
# On-chip A/B matrix for the round-2 SAM decode kernels (run on the real
# TPU when the tunnel is up; each cell is one bench_sam.py run at the
# reference-parity crop_n_layers=1 configuration).
#
#   bash runs/bench_mono_ab.sh [logfile]
#
# Matrix: two-step (baseline) vs monolithic decode kernel at 2/4 prompts
# per program, plus the per-prompt IoU gate (REGDA_SAM_IOU_GATE; NOTE:
# random-init weights fail pred_iou_thresh almost everywhere, so the
# gated numbers OVERSTATE the real-weight gain — record them as a
# ceiling, not a claim). Finishes with crop0 and the kernel parity check.
# Each cell's FULL output lands in /tmp/cell-<slug>.log (a crashed cell's
# traceback must survive — an earlier version piped through `tail -1` and
# lost the only evidence of an on-chip VMEM OOM).
set -u
LOG="${1:-/tmp/bench_mono_ab.log}"
cd "$(dirname "$0")/.."

run() {
  local label="$1"; shift
  local slug
  slug=$(echo "$label" | tr -c 'a-zA-Z0-9' '-')
  echo "=== $label [$*]" | tee -a "$LOG"
  env "$@" timeout 2400 python bench_sam.py > "/tmp/cell-$slug.log" 2>&1
  local rc=$?
  tail -1 "/tmp/cell-$slug.log" | tee -a "$LOG"
  if [ $rc -ne 0 ]; then
    echo "  !! rc=$rc — full log /tmp/cell-$slug.log" | tee -a "$LOG"
  fi
}

: > "$LOG"
# most informative cells first (the matrix has died to tunnel outages
# twice): decode A/B at the new exact-stability default, then the
# fast-stability twins that isolate the stability-scoring cost.
run "mono pp=2 (default)"             REGDA_MONO_DECODE=1
run "two-step (current default)"      REGDA_NO_MONO=1
run "two-step + fast stability"       REGDA_NO_MONO=1 REGDA_SAM_FAST_STABILITY=1
run "mono pp=2 + fast stability"      REGDA_MONO_DECODE=1 REGDA_SAM_FAST_STABILITY=1
run "mono pp=4"                       REGDA_MONO_DECODE=1 REGDA_MONO_PP=4
run "mono pp=1"                       REGDA_MONO_DECODE=1 REGDA_MONO_PP=1
run "crop0 mono pp=2"                 REGDA_MONO_DECODE=1 BENCH_SAM_CROPS=0
run "crop0 two-step"                  REGDA_NO_MONO=1 BENCH_SAM_CROPS=0
run "mono pp=2 + iou gate (ceiling)"  REGDA_MONO_DECODE=1 REGDA_SAM_IOU_GATE=1
run "two-step + iou gate (ceiling)"   REGDA_NO_MONO=1 REGDA_SAM_IOU_GATE=1 REGDA_MONO_PP=1

echo "=== kernel parity on chip" | tee -a "$LOG"
timeout 2400 python tools/check_kernels.py --quick 2>&1 | tail -2 | tee -a "$LOG"
echo "done; full log at $LOG"
