#!/bin/bash
# Round-4 CPU post-hoc: the 4 missing delta_uq evalmetrics cells
# (VERDICT r3 item 3).  These are the only missing evalmetrics whose
# model trees survived the r3 host re-provision — every other gap in the
# evalmetrics matrix has banked trial_results but no model.pth tree, so
# post-hoc reload is impossible without re-running the cell itself.
# Slow on this 1-core host (500-anchor Pareto models, 30+ min/cell) but
# the chip is busy with the minibude queue; nice-19 keeps the grid's
# host process ahead.  Cell-spec order: bench:method:dataset.
set -u
cd "$(dirname "$0")/../.."
G=experiments/grid_r4
R=experiments/full_cell/results
CFG_FULL=examples/bo_driven/config_full.yaml
mkdir -p "$G/artifacts"

for cell in ailerons:delta_uq:tails ailerons:delta_uq:gaps \
            puma:delta_uq:tails puma:delta_uq:gaps; do
    IFS=: read -r b m d <<< "$cell"
    out="$G/artifacts/evalmetrics_${b}_${d}_${m}.csv"
    [ -f "$out" ] && { echo "skip $cell (exists)"; continue; }
    nice -n 19 python examples/metric_evaluation/evaluate_metrics.py \
        --results_dir "$R" --config_file "$CFG_FULL" \
        --benchmark "$b" --dataset "$d" --method "$m" \
        --platform cpu --output "$out" \
        || echo "FAILED $cell"
done
echo POSTHOC_R4_CPU_DONE
