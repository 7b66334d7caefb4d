#!/bin/bash
# Full dense N-view benchmark sweep — the reference protocol
# (bash_scripts/benchmark/dense_n_view/mapa_24v.sh:11-21): (batch, views) =
# (10,2) (10,4) (10,8) (5,16) (4,24) (2,32) (1,50) (1,100) at 518 px over
# the ETH3D + ScanNet++V2 + TartanAirV2-WB test splits.
#
# Usage: WAI_ROOT=/data/wai CKPT=./params_ckpt OUT=results \
#            bash scripts/launch/benchmark_dense_n_view_sweep.sh
set -euo pipefail

WAI_ROOT="${WAI_ROOT:?set WAI_ROOT to the WAI scenes root}"
CKPT="${CKPT:?set CKPT to a converted params checkpoint}"
OUT="${OUT:-benchmark_results}"
# 518-bucket landscape resolution; swap per-dataset if your scenes differ
RES="${RES:-518 392}"

for dataset in eth3d scannetpp tav2_wb; do
    python scripts/benchmark_dense_n_view.py \
        --wai_root "$WAI_ROOT" \
        --dataset "$dataset" \
        --checkpoint "$CKPT" \
        --views 2 4 8 16 24 32 50 100 \
        --batch_sizes 10 10 10 5 4 2 1 1 \
        --resolution $RES \
        --memory_efficient \
        --output_dir "$OUT/dense_n_view/$dataset"
done
echo "sweep done -> $OUT/dense_n_view/{eth3d,scannetpp,tav2_wb}"
