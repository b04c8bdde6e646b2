#!/bin/bash
# Round-3 experiment grid: every cell launched through the L5 workflow
# driver (examples/bo_driven/workflow_driver.py), sequentially (one TPU
# process at a time — the chip is exclusive).  Two phases because the
# reference drives KDE cells from a separate config
# (reference examples/bo_driven/submit_workflow_kde.sh + config_kde.yaml:
# minibude benchmark, max_epochs 3) and the rest from the main config.
set -u
cd /root/repo

OUT=experiments/full_cell/results
RUNDIR=experiments/grid_r3/rundir

# Phase 1 — KDE / kNN-KDE cells at reference budget (minibude, tails+gaps).
# These exercise the Pallas KDE kernels through a real BO search and give
# the `gaps` split its first full cells.
python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_kde.yaml \
  --output "$OUT" --rundir "$RUNDIR" --max_tasks 1 \
  --cells minibude:kde:tails,minibude:knn_kde:tails,minibude:kde:gaps,minibude:knn_kde:gaps

# Phase 2 — main-config cells (binomial_options 16.7M-row dataset at the
# reference's 300-epoch budget + the airfoil real-data benchmark), in
# bank-the-finishable-first order:
#   1. delta_uq tails   — restart from trial 1 (r2's OOM fix + val-anchor cap)
#   2. mve tails        — first MVE cell at budget
#   3. airfoil ensemble — first real-data benchmark cell
#   4. mve gaps         — first binomial_options gaps cell
#   5. pager tails      — longest; restartable if the round ends first
python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output "$OUT" --rundir "$RUNDIR" --max_tasks 1 \
  --cells binomial_options:delta_uq:tails,binomial_options:mve:tails,airfoil:ensemble:tails,binomial_options:mve:gaps,binomial_options:pager:tails
