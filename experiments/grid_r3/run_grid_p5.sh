#!/bin/bash
# Phase 5: widen the non-KDE real-data coverage once the airfoil
# sub-grid (p3) is done — resume the ailerons ensemble partial (6/50
# from the chip window), give ailerons its gaps twin, then add a third
# method family to puma. All CPU-affordable (8-14k rows).
set -u
cd /root/repo
nice -n 10 python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output experiments/full_cell/results \
  --rundir experiments/grid_r3/rundir \
  --max_tasks 1 --platform cpu \
  --cells ailerons:ensemble:tails,ailerons:ensemble:gaps,puma:mc_dropout:tails,puma:mc_dropout:gaps,ailerons:mc_dropout:tails,ailerons:mc_dropout:gaps \
  >> experiments/grid_r3/driver_p5.log 2>&1
echo P5_DONE >> experiments/grid_r3/driver_p5.log
