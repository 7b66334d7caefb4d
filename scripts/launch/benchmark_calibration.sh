#!/bin/bash
# Calibration benchmark over the same test datasets (reference
# bash_scripts/benchmark/calibration/): single-view ray angular error.
#
# Usage: WAI_ROOT=/data/wai CKPT=./params_ckpt OUT=results \
#            bash scripts/launch/benchmark_calibration.sh
set -euo pipefail

WAI_ROOT="${WAI_ROOT:?set WAI_ROOT to the WAI scenes root}"
CKPT="${CKPT:?set CKPT to a converted params checkpoint}"
OUT="${OUT:-benchmark_results}"
RES="${RES:-518 392}"

for dataset in eth3d scannetpp tav2_wb; do
    python scripts/benchmark_calibration.py \
        --wai_root "$WAI_ROOT" \
        --dataset "$dataset" \
        --checkpoint "$CKPT" \
        --resolution $RES \
        --output_dir "$OUT/calibration/$dataset"
done
echo "calibration done -> $OUT/calibration/"
