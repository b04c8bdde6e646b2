#!/bin/bash
# Round-3 post-hoc pipeline over the MULTI-METHOD tree (the reference's
# cross-method comparison is the point of the grid): metric re-evaluation
# fanned per (benchmark × dataset) through the L4 metric_eval_driver,
# then collate + per-trial classification.
#
# Run ONLY after the workflow driver has stopped — the metric/classify
# passes execute on the TPU chip (single-process-exclusive).  The tools
# pin their platform explicitly (site hooks ignore JAX_PLATFORMS).
set -euo pipefail
cd "$(dirname "$0")/../.."
R=experiments/full_cell
G=experiments/grid_r3
mkdir -p "$G/artifacts"

# E5/E6: metric re-evaluation of the Pareto-best models, one subprocess
# per (benchmark, dataset) — sequential (--max_tasks 1): one chip.
# Two passes because the tree mixes configs: minibude cells trained under
# config_kde (scaling: false), so their eval datasets must be rebuilt with
# that config; everything else under config_full.
python examples/metric_evaluation/metric_eval_driver.py \
    --results_dir "$R/results" \
    --config_file examples/bo_driven/config_kde.yaml \
    --benchmarks minibude \
    --output "$G/artifacts/evaluated_metrics_kde.csv" \
    --rundir "$G/metric_eval_rundir" --max_tasks 1 --skip-completed
python examples/metric_evaluation/metric_eval_driver.py \
    --results_dir "$R/results" \
    --config_file examples/bo_driven/config_full.yaml \
    --benchmarks binomial_options,airfoil \
    --output "$G/artifacts/evaluated_metrics_full.csv" \
    --rundir "$G/metric_eval_rundir" --max_tasks 1 --skip-completed
python - <<'EOF'
import pandas as pd
a = 'experiments/grid_r3/artifacts/'
pd.concat([pd.read_csv(a + 'evaluated_metrics_kde.csv'),
           pd.read_csv(a + 'evaluated_metrics_full.csv')],
          ignore_index=True).to_csv(
    a + 'evaluated_metrics_combined.csv', index=False)
print('combined ->', a + 'evaluated_metrics_combined.csv')
EOF

# E8: cross-method collation (summary.csv + comparison plots) — CPU only
python examples/bo_driven/collate.py \
    --input "$R/results" --output "$G/artifacts/collate"

# E7: per-trial ID/OOD classification of every saved model.  The
# minibude/airfoil passes are precomputed on CPU while the grid holds the
# chip (run_classify_cpu.sh); the chip window only classifies the large
# binomial_options models.
python examples/bo_driven/classify_posthoc.py \
    --input "$R/results" --config examples/bo_driven/config_full.yaml \
    --benchmarks binomial_options \
    --output "$G/artifacts/classify" -p 0.8

echo "round-3 post-hoc artifacts in $G/artifacts"
