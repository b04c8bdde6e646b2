#!/bin/bash
# airfoil x delta_uq x tails at reference budget, pinned to CPU (chip
# outage contingency, same rationale as run_pager_cpu.sh): the only
# budget where a COMPLETE delta_uq cell is affordable without the chip.
set -u
cd /root/repo
nice -n 10 python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output experiments/full_cell/results \
  --rundir experiments/grid_r3/rundir \
  --max_tasks 1 --platform cpu \
  --cells airfoil:delta_uq:tails
