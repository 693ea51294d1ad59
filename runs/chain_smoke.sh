#!/usr/bin/env bash
# The SAM -> reg_dir -> train seam as ONE chain (VERDICT round-3 ask #6):
#
#   tiny synthetic torch SAM .pth  ->  models/sam/convert.py
#     ->  tools/seg_everything.py  ->  reg_dir/*.tif (int32 region maps)
#     ->  stage 1 + init_prototypes  ->  stage 2 (--sam-refine) whose LRH
#         consumes exactly those region maps
#
# This proves the reference's filesystem contract (SURVEY.md §3.5 /
# regda/utils/local_region_homog.py:41-64) end to end through the
# CONVERTED-checkpoint path, not as isolated parts. Runs on the tiny
# smoke dataset in ~minutes (TPU) — see runs/chain_smoke.log for a
# recorded run.
#
#   bash runs/chain_smoke.sh [logfile]
set -e
LOG="${1:-/tmp/chain_smoke.log}"
cd "$(dirname "$0")/.."
ROOT="${REGDA_SMOKE_ROOT:-/tmp/regda_tiny_smoke}"
CKPT=/tmp/chain_sam_tiny.pth

run() { echo "+ $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; }

: > "$LOG"

# 1. synthetic torch SAM checkpoint in the OFFICIAL state_dict layout
#    (tests/torch_sam_oracle.py is upstream-faithful; its state_dict
#    round-trips through convert.load_sam_checkpoint like a real
#    sam_vit_*.pth) — vit_t geometry, seeded weights
run python - <<EOF
import torch
from tests.torch_sam_oracle import SamOracle
torch.manual_seed(0)
oracle = SamOracle(img_size=128, embed_dim=64, depth=2, num_heads=2,
                   global_attn_indexes=(1,), window_size=14)
with torch.no_grad():
    g = torch.Generator().manual_seed(1)
    for p in oracle.parameters():
        p.add_(0.05 * torch.randn(p.shape, generator=g))
torch.save(oracle.state_dict(), '$CKPT')
print('saved tiny SAM checkpoint ->', '$CKPT')
EOF

# 2. materialize the tiny smoke dataset, then REGENERATE the target
#    train reg_dir with SAM everything-mode from the converted ckpt
#    (thresholds calibrated for near-random weights so regions exist;
#    real checkpoints use the reference defaults 0.90/0.95)
run python -c "import configs.st.regda.tiny_smoke"
run python tools/seg_everything.py \
    --img-dirs "$ROOT/Vaihingen/img_dir/train" \
    --checkpoint "$CKPT" --model-type vit_t --img-size 128 \
    --points-per-side 8 --pred-iou-thresh 0.1 --stability-thresh 0.0002 \
    --area-threshold 64 --batch-tiles 4
run python - <<EOF
import glob, numpy as np, imageio.v2 as iio
maps = [iio.imread(p) for p in
        sorted(glob.glob('$ROOT/Vaihingen/reg_dir/train/*.tif'))]
assert maps, 'seg_everything wrote no region maps'
n_reg = [int(m.max()) for m in maps]
assert any(n > 0 for n in n_reg), f'no regions painted: {n_reg}'
print('reg_dir region counts per tile:', n_reg)
EOF

# 3. stage 1 + prototypes + stage 2 with LRH consuming those reg maps
L="$ROOT/log"
run python tools/train_src.py --config-path st.regda.tiny_smoke \
    --align-domain 1
run python tools/init_prototypes.py --config-path st.regda.tiny_smoke \
    --ckpt-model "$L/src/Vaihingen_best.ckpt" \
    --ckpt-proto "$L/src/prototypes_best.ckpt" --stage 1
run python tools/train_align_reg.py --config-path st.regda.tiny_smoke \
    --ckpt-model "$L/src/Vaihingen_best.ckpt" \
    --ckpt-proto "$L/src/prototypes_best.ckpt" \
    --align-domain 1 --refine-label 1 --sam-refine --percent 0.5

echo "chain smoke complete; log at $LOG" | tee -a "$LOG"
