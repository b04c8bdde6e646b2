#!/bin/bash
# Round-4 session-2 CPU queue: rerun puma x knn_kde x tails (cell-21
# artifacts lost to the r3 host re-provision) at the reference
# config_kde budget, pinned to CPU so the chip stays free for the
# minibude queue + flagship cell.
set -u
cd /root/repo
G=experiments/grid_r4

python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_kde.yaml \
  --output experiments/full_cell/results \
  --rundir $G/rundir \
  --max_tasks 1 \
  --platform cpu \
  --cells puma:knn_kde:tails \
  >> $G/driver_puma_rerun.log 2>&1
echo R4_PUMA_RERUN_DONE >> $G/driver_puma_rerun.log
