#!/bin/bash
# Chip-recovery backlog, in priority order. Run ONLY when the chip is
# claimable again (check /tmp/chipwait.log shows CHIP_UP) and kill the
# chipwait watcher first — the chip is single-process-exclusive.
#
#  1. post-hoc metric eval for binomial_options/tails (the multi-method
#     cell: mve + mc_dropout + delta_uq partial; ensemble trial dirs were
#     pruned in round 2 -> FAILED rows by design)
#  2. rebuild the full/combined CSV artifacts
#  3. classify pass for binomial_options (chip: 150+ model loads over
#     33.4M-row eval sets)
#  4. ailerons ensemble resume + binomial delta_uq resume via the
#     workflow driver (sequential, interruptible, restartable)
set -u
cd /root/repo
R=experiments/full_cell
G=experiments/grid_r3

python examples/metric_evaluation/evaluate_metrics.py \
    --results_dir "$R/results" \
    --config_file examples/bo_driven/config_full.yaml \
    --benchmark binomial_options --dataset tails \
    --output "$G/metric_eval_rundir/metrics_binomial_options_tails.csv" \
    > "$G/metric_eval_rundir/binomial_options_tails.out" \
    2> "$G/metric_eval_rundir/binomial_options_tails.err"

python - <<'EOF'
import pandas as pd
r = 'experiments/grid_r3/metric_eval_rundir/'
a = 'experiments/grid_r3/artifacts/'
frames = [pd.read_csv(r + f'metrics_{c}.csv') for c in
          ('airfoil_tails', 'binomial_options_gaps', 'binomial_options_tails')]
full = pd.concat(frames, ignore_index=True)
full.to_csv(a + 'evaluated_metrics_full.csv', index=False)
kde = pd.read_csv(a + 'evaluated_metrics_kde.csv')
pd.concat([kde, full], ignore_index=True).to_csv(
    a + 'evaluated_metrics_combined.csv', index=False)
print('rows:', len(full), '+', len(kde))
EOF

python examples/bo_driven/classify_posthoc.py \
    --input "$R/results" --config examples/bo_driven/config_full.yaml \
    --benchmarks binomial_options \
    --output "$G/artifacts/classify" -p 0.8

python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output "$R/results" --rundir "$G/rundir" --max_tasks 1 \
  --cells ailerons:ensemble:tails,binomial_options:delta_uq:tails
