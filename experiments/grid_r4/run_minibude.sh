#!/bin/bash
# Round-4 chip queue, part 1: the 5 remaining minibude config.yaml cells
# that close the reference's 48-cell active grid (VERDICT r3 item 1).
# mc_dropout:gaps restarts from its banked 1/50; the anchored-pair cells
# start fresh. All through the L5 workflow driver (one queue, --restart,
# retries with backoff). Stop with experiments/grid_r3/stop_grid.sh.
set -u
cd /root/repo
G=experiments/grid_r4
mkdir -p $G/rundir

python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output experiments/full_cell/results \
  --rundir $G/rundir \
  --max_tasks 1 \
  --cells minibude:mc_dropout:gaps,minibude:delta_uq:tails,minibude:pager:tails,minibude:delta_uq:gaps,minibude:pager:gaps \
  >> $G/driver_minibude.log 2>&1
echo R4_MINIBUDE_DONE >> $G/driver_minibude.log
