#!/bin/bash
# Round-3 grid, final queue.  Breadth-first: every finishable cell before
# the multi-session delta_uq resume (see run_grid_p2c.sh for the cost
# math).  ailerons exercises the ARFF reader (C3) at reference budget for
# the first time; puma gives a real-data `gaps` cell.
set -u
cd /root/repo

OUT=experiments/full_cell/results
RUNDIR=experiments/grid_r3/rundir

python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output "$OUT" --rundir "$RUNDIR" --max_tasks 1 \
  --cells binomial_options:mve:tails,binomial_options:mve:gaps,ailerons:ensemble:tails,puma:ensemble:gaps,binomial_options:delta_uq:tails,binomial_options:pager:tails
