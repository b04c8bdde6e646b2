#!/bin/bash
# CPU-side half of the round-3 classify pass: the minibude (config_kde)
# and airfoil cells are small enough to classify on host CPU while the
# grid owns the TPU chip; tonight's chip window then only classifies the
# binomial_options models (posthoc.sh).
set -u
cd "$(dirname "$0")/../.."
G=experiments/grid_r3
mkdir -p "$G/artifacts"

python examples/bo_driven/classify_posthoc.py \
    --input experiments/full_cell/results \
    --config examples/bo_driven/config_kde.yaml \
    --benchmarks minibude --platform cpu \
    --output "$G/artifacts/classify_minibude" -p 0.8

python examples/bo_driven/classify_posthoc.py \
    --input experiments/full_cell/results \
    --config examples/bo_driven/config_full.yaml \
    --benchmarks airfoil --platform cpu \
    --output "$G/artifacts/classify_airfoil" -p 0.8

echo classify-cpu DONE
