#!/bin/bash
# Round-3 grid, phase 2 (reordered mid-round): bank the short airfoil
# real-data cell first, then finish delta_uq (restart from trial 3),
# then the mve cells; pager last (restartable if the round ends first).
# Sequential, one TPU process at a time.
set -u
cd /root/repo

OUT=experiments/full_cell/results
RUNDIR=experiments/grid_r3/rundir

python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output "$OUT" --rundir "$RUNDIR" --max_tasks 1 \
  --cells airfoil:ensemble:tails,binomial_options:delta_uq:tails,binomial_options:mve:tails,binomial_options:mve:gaps,binomial_options:pager:tails
