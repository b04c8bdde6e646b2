#!/bin/bash
# Round-4 session-4 end-of-round post-hoc refresh. Run AFTER
# run_chip_window_s4.sh: the banked tree then includes the completed
# flagship cell and the ailerons mve extension cells.
#  1. rebuild the collate tree from banked artifacts (single source of
#     truth) and rerun the full-grid collate;
#  2. classify pass over the flagship cell's live tree (the first time a
#     live binomial_options delta_uq tree has survived to this step);
#  3. classify pass over the ailerons mve extension cells.
set -u
cd "$(dirname "$0")/../.."
G=experiments/grid_r4

python $G/build_collate_tree.py

nice -n 19 python examples/bo_driven/collate.py \
    --input $G/collate_tree \
    --output $G/artifacts/collate_full 2>&1 | tail -5

nice -n 19 python examples/bo_driven/classify_posthoc.py \
    --input experiments/full_cell/results \
    --config examples/bo_driven/config_full.yaml \
    --benchmarks binomial_options --methods delta_uq \
    --output "$G/artifacts/classify_flagship" -p 0.8 2>&1 | tail -3

nice -n 19 python examples/bo_driven/classify_posthoc.py \
    --input experiments/full_cell/results \
    --config examples/bo_driven/config_full.yaml \
    --benchmarks ailerons --methods mve \
    --output "$G/artifacts/classify_ailerons_mve" -p 0.8 2>&1 | tail -3

echo FINALIZE_POSTHOC_S4_DONE
