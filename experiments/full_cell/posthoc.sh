#!/bin/bash
# Post-hoc pipeline for the full-budget binomial_options × ensemble × tails
# cell (50 trials at reference budget, examples/bo_driven/config_full.yaml):
# Pareto-selected metric re-evaluation, collate plots, and per-trial
# post-hoc ID/OOD classification.
set -euo pipefail
cd "$(dirname "$0")/../.."
R=experiments/full_cell
mkdir -p "$R/artifacts"

python examples/metric_evaluation/evaluate_metrics.py \
    --results_dir "$R/results" \
    --config_file examples/bo_driven/config_full.yaml \
    --benchmark binomial_options --dataset tails \
    --output "$R/artifacts/evaluated_metrics.csv"

python examples/bo_driven/collate.py \
    --input "$R/results" --output "$R/artifacts/collate"

python examples/bo_driven/classify_posthoc.py \
    --input "$R/results" --config examples/bo_driven/config_full.yaml \
    --output "$R/artifacts/classify" -p 0.8

echo "post-hoc artifacts in $R/artifacts"
