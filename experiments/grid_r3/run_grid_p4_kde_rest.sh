#!/bin/bash
# Phase 4: finish the reference's 16-cell KDE grid (4 benchmarks x
# {kde,knn_kde} x {tails,gaps}); ailerons first (no cell yet), then the
# puma knn_kde pair.
set -u
cd /root/repo
nice -n 10 python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_kde.yaml \
  --output experiments/full_cell/results \
  --rundir experiments/grid_r3/rundir \
  --max_tasks 1 --platform cpu \
  --cells ailerons:kde:tails,ailerons:knn_kde:tails,ailerons:kde:gaps,ailerons:knn_kde:gaps,puma:knn_kde:tails,puma:knn_kde:gaps \
  >> experiments/grid_r3/driver_p4.log 2>&1
echo P4_KDE_DONE >> experiments/grid_r3/driver_p4.log
