#!/bin/bash
# Post-hoc metric eval for the airfoil KDE-family cells (14-17), CPU,
# nice 19 so the running grid keeps the core.
set -u
cd /root/repo
G=experiments/grid_r3/metric_eval_rundir
for m in kde knn_kde; do
  for d in tails gaps; do
    nice -n 19 python examples/metric_evaluation/evaluate_metrics.py \
      --results_dir experiments/full_cell/results \
      --config_file examples/bo_driven/config_kde.yaml \
      --benchmark airfoil --dataset $d --method $m --platform cpu \
      --output "$G/metrics_airfoil_${d}_${m}.csv" \
      > "$G/airfoil_${d}_${m}.out" 2> "$G/airfoil_${d}_${m}.err"
  done
done
echo DONE_KDEFAM
