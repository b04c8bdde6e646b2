#!/bin/bash
# CPU post-hoc over the session-2 KDE-family cells (ailerons x {kde,
# knn_kde} x {tails,gaps}, puma x knn_kde x gaps) while the config_full
# grid owns the TPU chip.  Per-cell --method filtering keeps the pass off
# the in-progress config_full cells sharing the same tree.
set -u
cd "$(dirname "$0")/../.."
G=experiments/grid_r3
R=experiments/full_cell/results
CFG=examples/bo_driven/config_kde.yaml
mkdir -p "$G/artifacts"

for cell in ailerons:kde:tails ailerons:knn_kde:tails \
            ailerons:kde:gaps ailerons:knn_kde:gaps puma:knn_kde:gaps; do
    IFS=: read -r b m d <<< "$cell"
    out="$G/artifacts/evalmetrics_${b}_${d}_${m}.csv"
    [ -f "$out" ] && { echo "skip $cell (exists)"; continue; }
    python examples/metric_evaluation/evaluate_metrics.py \
        --results_dir "$R" --config_file "$CFG" \
        --benchmark "$b" --dataset "$d" --method "$m" \
        --platform cpu --output "$out" \
        || echo "FAILED $cell"
done

python examples/bo_driven/classify_posthoc.py \
    --input "$R" --config "$CFG" \
    --benchmarks ailerons,puma --methods kde,knn_kde \
    --platform cpu \
    --output "$G/artifacts/classify_s2_kde" -p 0.8

echo POSTHOC_S2_KDE_DONE
