#!/bin/bash
# Round-3 grid, continuation queue (after the chip outage ~20:00-21:?? UTC).
# Order: shortest-first banking, then family coverage:
#   1. ailerons:ensemble:tails   — resume from trial 6 (~40 min to 50/50)
#   2. puma:ensemble:gaps        — real-data `gaps` cell
#   3. airfoil:delta_uq:tails    — a *complete* delta_uq cell at a budget
#                                  the anchored eval can afford
#   4. binomial_options:delta_uq:tails — multi-session resume, runs last
#      (interruptible; stays restartable when the round ends)
# airfoil:pager:tails runs separately on CPU (run_pager_cpu.sh, chip
# outage contingency) — keep it OUT of this queue or two bo.py processes
# would race on the same trial dirs.
set -u
cd /root/repo

OUT=experiments/full_cell/results
RUNDIR=experiments/grid_r3/rundir

python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output "$OUT" --rundir "$RUNDIR" --max_tasks 1 \
  --cells ailerons:ensemble:tails,puma:ensemble:gaps,airfoil:delta_uq:tails,binomial_options:delta_uq:tails
