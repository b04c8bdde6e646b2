#!/bin/bash
# Round-3 grid, phase 2 final order.  delta_uq cannot complete in the
# remaining session budget — its BO search samples up to 500 anchors and
# the reference timed-eval protocol (5 warmup + 10 timed passes x 3
# datasets) makes high-anchor trials 10-35 min each on the 16.7M-row
# benchmark — so the two finishable mve cells run first and delta_uq
# resumes with whatever chip time is left (restartable across rounds).
set -u
cd /root/repo

OUT=experiments/full_cell/results
RUNDIR=experiments/grid_r3/rundir

python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output "$OUT" --rundir "$RUNDIR" --max_tasks 1 \
  --cells binomial_options:mve:tails,binomial_options:mve:gaps,binomial_options:delta_uq:tails,binomial_options:pager:tails
