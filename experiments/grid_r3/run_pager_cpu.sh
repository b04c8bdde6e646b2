#!/bin/bash
# airfoil x pager x tails at reference budget, pinned to CPU.
# Started during the 20:04+ UTC chip outage so the last uncovered UQ
# family banks a complete cell regardless of chip recovery; platform is
# recorded in EXPERIMENTS.md (the reference grid likewise mixed A40/A100
# partitions). Tiny benchmark (1,503 rows) - the only family x budget
# combination that is CPU-affordable.
set -u
cd /root/repo
nice -n 10 python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output experiments/full_cell/results \
  --rundir experiments/grid_r3/rundir \
  --max_tasks 1 --platform cpu \
  --cells airfoil:pager:tails
