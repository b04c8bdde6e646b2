#!/bin/bash
# Round-4 end-of-round post-hoc: the reference's end product over the
# ENTIRE banked grid (VERDICT r3 item 3).
#  1. rebuild the collate tree from the banked artifacts (single source
#     of truth — covers cells whose live trees died with the r3 host);
#  2. full-grid collate: summary.csv + per-cell figures across every
#     benchmark x split x method;
#  3. classify refresh over the live trees for the cells new this round
#     (minibude config_full methods, puma knn_kde rerun).
set -u
cd "$(dirname "$0")/../.."
G=experiments/grid_r4

python experiments/grid_r4/build_collate_tree.py

nice -n 19 python examples/bo_driven/collate.py \
    --input $G/collate_tree \
    --output $G/artifacts/collate_full 2>&1 | tail -5

nice -n 19 python examples/bo_driven/classify_posthoc.py \
    --input experiments/full_cell/results \
    --config examples/bo_driven/config_full.yaml \
    --benchmarks minibude --platform cpu \
    --output "$G/artifacts/classify_minibude_full" -p 0.8 2>&1 | tail -3

nice -n 19 python examples/bo_driven/classify_posthoc.py \
    --input experiments/full_cell/results \
    --config examples/bo_driven/config_kde.yaml \
    --benchmarks puma --methods knn_kde --platform cpu \
    --output "$G/artifacts/classify_puma_rerun" -p 0.8 2>&1 | tail -3

echo FINALIZE_POSTHOC_DONE
