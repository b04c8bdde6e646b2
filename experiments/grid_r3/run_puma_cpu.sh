#!/bin/bash
# puma x ensemble x gaps at reference budget, pinned to CPU (chip outage
# contingency): the real-data `gaps`-split cell. puma is 8,192 rows —
# ensemble training (2-32 vmapped members) stays CPU-affordable.
set -u
cd /root/repo
nice -n 10 python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output experiments/full_cell/results \
  --rundir experiments/grid_r3/rundir \
  --max_tasks 1 --platform cpu \
  --cells puma:ensemble:gaps
