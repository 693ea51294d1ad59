#!/bin/bash
# LRH end-metric study on the salt-corruption testbed (VERDICT r2 item 2).
# Salt corruption scatters severe per-pixel errors that the region-majority
# vote can fix (the Homogenizer's regime, local_region_homog.py:99-152);
# a LONG stage-1 run builds the strong source model the reference applies
# LRH to. Usage: bash runs/salt_lrh.sh [root] [stage1_steps] [stage2_steps]
set -ex
cd /root/repo
export REGDA_PARITY_ROOT=${1:-/tmp/regda_parity_salt2}
export REGDA_PARITY_GAP=${REGDA_PARITY_GAP:-0.10}
export REGDA_PARITY_NOISE=${REGDA_PARITY_NOISE:-10}
export REGDA_PARITY_SALT=${REGDA_PARITY_SALT:-0.25}
S1=${2:-1200}
S2=${3:-300}
LABEL="salt strong-src g${REGDA_PARITY_GAP} n${REGDA_PARITY_NOISE} salt${REGDA_PARITY_SALT} s1=${S1}"

echo "=== stage 1 (long, ${S1} steps) ==="
timeout 3000 python tools/run_parity.py --tpu --only-src --steps "$S1"

echo "=== LRH mechanism probe ==="
timeout 1200 python tools/run_parity.py --tpu --mechanism \
    --section-label "$LABEL"

echo "=== LRH end-metric seeds (4x full vs no-LRH, ${S2} steps) ==="
timeout 5400 python tools/run_parity.py --tpu --lrh-seeds 4 --steps "$S2" \
    --start-at align --section-label "$LABEL"

echo "=== salt_lrh done ==="
