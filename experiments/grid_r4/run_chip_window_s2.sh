#!/bin/bash
# Round-4 session-2 chip window, chained behind the 2-cell minibude queue
# (run_minibude3.sh).  The session-1 host re-provision wiped every live
# results tree, so this chain banks artifacts IMMEDIATELY as each stage
# lands:
#   1. bank the two grid-closing minibude cells (48/48 active grid);
#   2. on-chip evalmetrics for those two cells while their live trees
#      exist (minutes each with the fused anchored kernel vs hours on
#      the 1-core host);
#   3. fused-eval kernel variant measurements (bf16/tile/packed ensemble
#      variants + anchored fused-vs-vmap) — the VERDICT r3 item-4 data;
#   4. launch the flagship binomial_options x delta_uq x tails cell via
#      the workflow driver with --restart from the re-materialised
#      banked trial-0 failure row, on the documented
#      eval_precision: bf16-mixed config variant.  Runs until stopped
#      (exact-pid via /tmp/flagship.pid).
set -u
cd "$(dirname "$0")/../.."
G=experiments/grid_r4
mkdir -p $G/artifacts

# wait for the minibude driver queue to drain
while ! grep -q R4S2_MINIBUDE_DONE $G/driver_minibude_s2.log 2>/dev/null; do
    sleep 60
done

bash experiments/grid_r3/bank_cell.sh minibude delta_uq gaps \
    >> $G/bank_s2.log 2>&1 || echo "BANK FAILED minibude delta_uq gaps" >> $G/bank_s2.log
bash experiments/grid_r3/bank_cell.sh minibude pager gaps \
    >> $G/bank_s2.log 2>&1 || echo "BANK FAILED minibude pager gaps" >> $G/bank_s2.log
echo R4S2_BANK_DONE >> $G/bank_s2.log

for cell in minibude:delta_uq:gaps minibude:pager:gaps; do
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

python experiments/grid_r4/kernel_variants.py \
  > $G/kernel_variants.out 2> $G/kernel_variants.err
python experiments/grid_r4/kernel_variants.py --anchored \
  >> $G/kernel_variants.out 2>> $G/kernel_variants.err
echo VARIANTS_DONE >> $G/kernel_variants.out

python examples/bo_driven/workflow_driver.py \
  --config examples/bo_driven/config_full_bf16eval.yaml \
  --output experiments/full_cell/results \
  --rundir $G/rundir \
  --max_tasks 1 \
  --cells binomial_options:delta_uq:tails \
  >> $G/driver_flagship.log 2>&1 &
echo $! > /tmp/flagship.pid
wait
echo R4_FLAGSHIP_EXITED >> $G/driver_flagship.log
