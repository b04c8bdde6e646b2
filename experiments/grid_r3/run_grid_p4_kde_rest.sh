#!/bin/bash
# Phase 4 (time permitting): the KDE-family cells dropped from the
# phase-2 queue when it was preempted for the airfoil completion sweep.
set -u
cd /root/repo
nice -n 10 python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_kde.yaml \
  --output experiments/full_cell/results \
  --rundir experiments/grid_r3/rundir \
  --max_tasks 1 --platform cpu \
  --cells puma:knn_kde:tails,puma:knn_kde:gaps,ailerons:kde:tails,ailerons:kde:gaps,ailerons:knn_kde:tails,ailerons:knn_kde:gaps \
  >> experiments/grid_r3/driver_p4.log 2>&1
echo P4_KDE_DONE >> experiments/grid_r3/driver_p4.log
