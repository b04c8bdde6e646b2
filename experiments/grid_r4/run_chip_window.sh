#!/bin/bash
# Round-4 chip window, chained behind the minibude queue:
#   1. rerun puma x knn_kde x tails (cell-21 artifacts lost to the r3
#      host re-provision) at the reference config_kde budget;
#   2. fused-eval kernel variant measurements (bf16/tile/packed ensemble
#      variants + anchored fused-vs-vmap) — the VERDICT r3 item-4 data;
#   3. launch the flagship binomial_options x delta_uq x tails cell via
#      the workflow driver with --restart; with the fused anchored eval
#      kernel this is the first round where the cell could complete
#      inside one session.  It runs until stopped (stop_grid.sh-style
#      exact-pid walk via /tmp/flagship.pid).
set -u
cd "$(dirname "$0")/../.."
G=experiments/grid_r4

# wait for the minibude driver queue to drain
while ! grep -q R4_MINIBUDE_DONE $G/driver_minibude.log 2>/dev/null; do
    sleep 60
done

python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_kde.yaml \
  --output experiments/full_cell/results \
  --rundir $G/rundir \
  --max_tasks 1 \
  --cells puma:knn_kde:tails \
  >> $G/driver_puma_rerun.log 2>&1
echo R4_PUMA_RERUN_DONE >> $G/driver_puma_rerun.log

python experiments/grid_r4/kernel_variants.py \
  > $G/kernel_variants.out 2> $G/kernel_variants.err
python experiments/grid_r4/kernel_variants.py --anchored \
  >> $G/kernel_variants.out 2>> $G/kernel_variants.err
echo VARIANTS_DONE >> $G/kernel_variants.out

# delta_uq evalmetrics on-chip (minutes each with the fused anchored
# kernel vs hours on the 1-core host); skip any the CPU queue already
# banked.  Same cells as run_posthoc_cpu.sh (bench:method:dataset).
for cell in ailerons:delta_uq:tails ailerons:delta_uq:gaps \
            puma:delta_uq:tails puma:delta_uq:gaps; do
    IFS=: read -r b m d <<< "$cell"
    out="$G/artifacts/evalmetrics_${b}_${d}_${m}.csv"
    [ -f "$out" ] && { echo "skip $cell (exists)" >> $G/posthoc_chip.log; continue; }
    python examples/metric_evaluation/evaluate_metrics.py \
        --results_dir experiments/full_cell/results \
        --config_file examples/bo_driven/config_full.yaml \
        --benchmark "$b" --dataset "$d" --method "$m" \
        --output "$out" \
        >> $G/posthoc_chip.log 2>&1 \
        || echo "FAILED $cell" >> $G/posthoc_chip.log
done
echo POSTHOC_CHIP_DONE >> $G/posthoc_chip.log

python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config.yaml \
  --output experiments/full_cell/results \
  --rundir $G/rundir \
  --max_tasks 1 \
  --cells binomial_options:delta_uq:tails \
  >> $G/driver_flagship.log 2>&1 &
echo $! > /tmp/flagship.pid
wait
echo R4_FLAGSHIP_EXITED >> $G/driver_flagship.log
