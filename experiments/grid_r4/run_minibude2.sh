#!/bin/bash
# Round-4 chip queue, part 1b: the 3 remaining minibude cells after the
# fused-anchored-kernel fix (pager:tails reruns fresh — its first attempt
# burned 54 trials on the unlowerable dynamic_slice kernel and was
# cleared).  Appends R4_MINIBUDE_DONE to the SAME log the chip-window
# chain waits on.
set -u
cd /root/repo
G=experiments/grid_r4

python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output experiments/full_cell/results \
  --rundir $G/rundir \
  --max_tasks 1 \
  --cells minibude:pager:tails,minibude:delta_uq:gaps,minibude:pager:gaps \
  >> $G/driver_minibude.log 2>&1
echo R4_MINIBUDE_DONE >> $G/driver_minibude.log
