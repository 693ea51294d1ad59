#!/usr/bin/env bash
# Full Vaihingen -> Potsdam IRRG pipeline (reference runs/regda/
# run_2potsdam.sh, checkpoints as Orbax .ckpt instead of .pth).
set -e

python tools/train_src.py --config-path st.regda.2potsdam \
  --align-domain 1

python tools/init_prototypes.py --config-path st.regda.2potsdam \
  --ckpt-model log/regda/2potsdam/src/Potsdam_best.ckpt \
  --ckpt-proto log/regda/2potsdam/src/prototypes_best.ckpt \
  --stage 1

python tools/train_align_reg.py --config-path st.regda.2potsdam \
  --ckpt-model log/regda/2potsdam/src/Potsdam_best.ckpt \
  --ckpt-proto log/regda/2potsdam/src/prototypes_best.ckpt \
  --align-domain 1 --refine-label 1 --sam-refine --percent 0.5

python tools/init_prototypes.py --config-path st.regda.2potsdam \
  --ckpt-model log/regda/2potsdam/align/Potsdam_best.ckpt \
  --ckpt-proto log/regda/2potsdam/align/prototypes_best.ckpt \
  --stage 2

python tools/train_ssl_reg.py --config-path st.regda.2potsdam \
  --ckpt-model log/regda/2potsdam/align/Potsdam_best.ckpt \
  --ckpt-proto log/regda/2potsdam/align/prototypes_best.ckpt \
  --gen 1 --refine-label 1 --sam-refine --percent 0.5
