#!/usr/bin/env bash
# Stage-1 curriculum: 4-view training (reference
# bash_scripts/train/main/mapa_curri_4v_13d_48ipg_64g.sh role).
set -euo pipefail
WAI_ROOT=${WAI_ROOT:-/data/wai}
OUT=${OUT:-./out/mapa_curri}
python scripts/train.py \
  --wai_root "$WAI_ROOT" \
  --dataset_spec "$(tr '\n' ' ' < "$(dirname "$0")/mix_13d_4view.txt")" \
  --max_imgs_per_device 48 --epochs 20 --lr 2e-4 --encoder_lr_scale 0.05 \
  --warmup_steps 4000 --total_steps 200000 \
  --task aug_training --output_dir "$OUT" "$@"
