#!/bin/bash
# KDE-family cells over the three small real-data benchmarks, both splits,
# at reference budget (config_kde: max_epochs 3, scaling false — the
# reference drives these from submit_workflow_kde.sh with the same grid).
# Pinned to CPU during the chip outage: at these data sizes (1.5k-13.7k
# rows) the exact-sum KDE/kNN scoring is CPU-trivial.
set -u
cd /root/repo
nice -n 10 python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_kde.yaml \
  --output experiments/full_cell/results \
  --rundir experiments/grid_r3/rundir \
  --max_tasks 1 --platform cpu \
  --cells airfoil:kde:tails,airfoil:kde:gaps,airfoil:knn_kde:tails,airfoil:knn_kde:gaps,puma:kde:tails,puma:kde:gaps,puma:knn_kde:tails,puma:knn_kde:gaps,ailerons:kde:tails,ailerons:kde:gaps,ailerons:knn_kde:tails,ailerons:knn_kde:gaps
