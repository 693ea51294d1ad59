#!/usr/bin/env bash
# Full-length stage-2 + stage-3 drive at reference shapes on the real
# chip (FULLRUN.md; the stage-1 counterpart ran in round 2). Schedules
# and flags mirror the reference recipe (runs/regda/run_2vaihingen.sh /
# reference tools/train_align_reg.py:144-220, train_ssl_reg.py:176-266)
# on the synthetic full_smoke dataset: batch 8 x 512^2, ResNet-101,
# 6000 steps per stage, eval/checkpoint every 500, offline
# pseudo-generation (--gen 1) before stage 3.
#
#   bash runs/full_stage23.sh [logfile]
#
# A mid-stage-2 kill + --auto-resume is exercised by the driver session
# (kill the process around step ~2000, rerun this script: every stage
# passes --auto-resume 1 and skips completed stages by best-ckpt mtime).
set -e
LOG="${1:-/tmp/full_stage23.log}"
cd "$(dirname "$0")/.."
ROOT="${REGDA_FULL_ROOT:-/tmp/regda_full_smoke}"
L="$ROOT/log"

run() { echo "+ $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; }

if [ ! -f "$L/src/prototypes_best.ckpt" ]; then
  run python tools/train_src.py --config-path st.regda.full_smoke \
      --align-domain 1 --auto-resume 1
  run python tools/init_prototypes.py --config-path st.regda.full_smoke \
      --ckpt-model "$L/src/Vaihingen_best.ckpt" \
      --ckpt-proto "$L/src/prototypes_best.ckpt" --stage 1
fi

run python tools/train_align_reg.py --config-path st.regda.full_smoke \
    --ckpt-model "$L/src/Vaihingen_best.ckpt" \
    --ckpt-proto "$L/src/prototypes_best.ckpt" \
    --align-domain 1 --refine-label 1 --sam-refine --percent 0.5 \
    --auto-resume 1

run python tools/init_prototypes.py --config-path st.regda.full_smoke \
    --ckpt-model "$L/align/Vaihingen_best.ckpt" \
    --ckpt-proto "$L/align/prototypes_best.ckpt" --stage 2

run python tools/train_ssl_reg.py --config-path st.regda.full_smoke \
    --ckpt-model "$L/align/Vaihingen_best.ckpt" \
    --ckpt-proto "$L/align/prototypes_best.ckpt" \
    --gen 1 --refine-label 1 --sam-refine --percent 0.5 \
    --auto-resume 1

echo "full stage-2/3 drive complete; log at $LOG"
