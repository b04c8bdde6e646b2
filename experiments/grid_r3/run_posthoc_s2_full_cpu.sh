#!/bin/bash
# CPU post-hoc over the session-2 config_full cells as they complete
# (ailerons/puma/airfoil ensemble + mc_dropout), while the grid owns the
# chip.  Re-runnable: skips cells whose output CSV already exists, so it
# can be invoked again after each new cell lands.  Cells are passed as
# bench:method:dataset args (same order as workflow_driver --cells), or default to the completed ailerons set.
set -u
cd "$(dirname "$0")/../.."
G=experiments/grid_r3
R=experiments/full_cell/results
CFG=examples/bo_driven/config_full.yaml
mkdir -p "$G/artifacts"

CELLS=${@:-ailerons:ensemble:tails ailerons:ensemble:gaps ailerons:mc_dropout:tails}
for cell in $CELLS; do
    IFS=: read -r b m d <<< "$cell"
    out="$G/artifacts/evalmetrics_${b}_${d}_${m}.csv"
    [ -f "$out" ] && { echo "skip $cell (exists)"; continue; }
    nice -n 15 python examples/metric_evaluation/evaluate_metrics.py \
        --results_dir "$R" --config_file "$CFG" \
        --benchmark "$b" --dataset "$d" --method "$m" \
        --platform cpu --output "$out" \
        || echo "FAILED $cell"
done
echo POSTHOC_S2_FULL_DONE
