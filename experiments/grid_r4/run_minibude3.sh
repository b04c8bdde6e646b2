#!/bin/bash
# Round-4 session-2 chip queue, part 1: the last 2 minibude cells that
# close the reference's 48-cell active grid (delta_uq:gaps, pager:gaps).
# The session-1 host re-provision cut the queue after pager:tails banked.
set -u
cd /root/repo
G=experiments/grid_r4

python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output experiments/full_cell/results \
  --rundir $G/rundir \
  --max_tasks 1 \
  --cells minibude:delta_uq:gaps,minibude:pager:gaps \
  >> $G/driver_minibude_s2.log 2>&1
echo R4S2_MINIBUDE_DONE >> $G/driver_minibude_s2.log
