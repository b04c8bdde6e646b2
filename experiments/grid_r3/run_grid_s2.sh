#!/bin/bash
# Round-3 session-2 chip queue (fresh host: 1 CPU core, results tree
# re-provisioned — all cells restart from the committed artifacts' seeds).
#
# Order: (1) finish the KDE sub-grid (config_kde, 3-epoch cells, fast);
# (2) config_full grid, cheapest training first (ailerons 86 batches/epoch,
# puma 51, airfoil 9), anchored-pair methods next (small eval sets make
# delta_uq/pager affordable off-binomial), minibude (410 batches/epoch) last.
# Every cell goes through the L5 workflow driver: sequential, --restart,
# retries with backoff. Kill with stop_grid.sh before round end.
set -u
cd /root/repo
G=experiments/grid_r3

python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_kde.yaml \
  --output experiments/full_cell/results \
  --rundir $G/rundir \
  --max_tasks 1 \
  --cells ailerons:kde:tails,ailerons:knn_kde:tails,ailerons:kde:gaps,ailerons:knn_kde:gaps,puma:knn_kde:gaps \
  >> $G/driver_s2_kde.log 2>&1
echo S2_KDE_DONE >> $G/driver_s2_kde.log

python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full.yaml \
  --output experiments/full_cell/results \
  --rundir $G/rundir \
  --max_tasks 1 \
  --cells ailerons:ensemble:tails,ailerons:ensemble:gaps,ailerons:mc_dropout:tails,ailerons:mc_dropout:gaps,puma:ensemble:tails,puma:mc_dropout:tails,puma:mc_dropout:gaps,airfoil:mc_dropout:tails,airfoil:mc_dropout:gaps,airfoil:ensemble:gaps,ailerons:delta_uq:tails,ailerons:pager:tails,ailerons:delta_uq:gaps,ailerons:pager:gaps,puma:delta_uq:tails,puma:pager:tails,puma:delta_uq:gaps,puma:pager:gaps,airfoil:delta_uq:gaps,airfoil:pager:gaps,minibude:ensemble:tails,minibude:mc_dropout:tails,minibude:ensemble:gaps,minibude:mc_dropout:gaps,minibude:delta_uq:tails,minibude:pager:tails,minibude:delta_uq:gaps,minibude:pager:gaps \
  >> $G/driver_s2_full.log 2>&1
echo S2_FULL_DONE >> $G/driver_s2_full.log
