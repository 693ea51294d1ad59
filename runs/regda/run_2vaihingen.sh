#!/usr/bin/env bash
# Full Potsdam IRRG -> Vaihingen pipeline (reference runs/regda/
# run_2vaihingen.sh, checkpoints as Orbax .ckpt instead of .pth).
set -e

python tools/train_src.py --config-path st.regda.2vaihingen \
  --align-domain 1

python tools/init_prototypes.py --config-path st.regda.2vaihingen \
  --ckpt-model log/regda/2vaihingen/src/Vaihingen_best.ckpt \
  --ckpt-proto log/regda/2vaihingen/src/prototypes_best.ckpt \
  --stage 1

python tools/train_align_reg.py --config-path st.regda.2vaihingen \
  --ckpt-model log/regda/2vaihingen/src/Vaihingen_best.ckpt \
  --ckpt-proto log/regda/2vaihingen/src/prototypes_best.ckpt \
  --align-domain 1 --refine-label 1 --sam-refine --percent 0.5

python tools/init_prototypes.py --config-path st.regda.2vaihingen \
  --ckpt-model log/regda/2vaihingen/align/Vaihingen_best.ckpt \
  --ckpt-proto log/regda/2vaihingen/align/prototypes_best.ckpt \
  --stage 2

python tools/train_ssl_reg.py --config-path st.regda.2vaihingen \
  --ckpt-model log/regda/2vaihingen/align/Vaihingen_best.ckpt \
  --ckpt-proto log/regda/2vaihingen/align/prototypes_best.ckpt \
  --gen 1 --refine-label 1 --sam-refine --percent 0.5
