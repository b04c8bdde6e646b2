#!/bin/bash
# Phase 3: complete airfoil's full method x split sub-grid at reference
# budget on CPU, through the L5 driver. Reference-grid methods first
# (reference config.yaml actives: ensemble/delta_uq/pager/mc_dropout —
# binomial_options is commented out there, so airfoil et al. ARE the
# reference grid), then the mve extension cells.
# Already complete: ensemble:tails, delta_uq:tails, pager:tails,
# kde:both, knn_kde:both.
set -u
cd /root/repo
nice -n 10 python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output experiments/full_cell/results \
  --rundir experiments/grid_r3/rundir \
  --max_tasks 1 --platform cpu \
  --cells airfoil:mc_dropout:tails,airfoil:ensemble:gaps,airfoil:mc_dropout:gaps,airfoil:delta_uq:gaps,airfoil:pager:gaps,airfoil:mve:tails,airfoil:mve:gaps \
  >> experiments/grid_r3/driver_p3.log 2>&1
echo P3_AIRFOIL_DONE >> experiments/grid_r3/driver_p3.log
