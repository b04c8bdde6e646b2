#!/bin/bash
# Round-4 session-3 post-flagship chip window.  Launch ONLY after the
# flagship workflow driver (binomial_options x delta_uq x tails) exits —
# the chip is single-claim.  Order is by value-per-minute:
#   1. bank the flagship cell immediately (whatever it reached);
#   2. fused-eval kernel variants incl. the layer-outer H-L entries
#      (the r4 perf hypothesis: MXU pipeline occupancy, not dtype);
#   3. anchored fused-vs-vmap bench (VERDICT r3 item 4 completion);
#   4. rerun the 4 delta_uq cells whose model trees died with the r3
#      host (ailerons/puma x tails/gaps) and run evaluate_metrics on
#      each live tree right away — closes the post-hoc evalmetrics
#      matrix (VERDICT r3 item 3);
#   5. bank those cells.
# bench.py headline recording is done manually after step 2's numbers
# decide the production kernel order.
set -u
cd /root/repo
G=experiments/grid_r4
R=experiments/full_cell/results
mkdir -p "$G/artifacts"

bash experiments/grid_r3/bank_cell.sh binomial_options delta_uq tails \
    >> $G/bank_s3.log 2>&1 || echo "BANK FAILED flagship" >> $G/bank_s3.log
echo S3_FLAGSHIP_BANKED >> $G/bank_s3.log

timeout 1800 python $G/kernel_variants.py --reps 11 \
    > $G/kernel_variants_s3.out 2> $G/kernel_variants_s3.err
echo S3_VARIANTS_RC=$? >> $G/kernel_variants_s3.out

timeout 1800 python $G/kernel_variants.py --anchored \
    > $G/kernel_variants_anchored.out 2> $G/kernel_variants_anchored.err
echo S3_ANCHORED_RC=$? >> $G/kernel_variants_anchored.out

for cell in ailerons:delta_uq:tails ailerons:delta_uq:gaps \
            puma:delta_uq:tails puma:delta_uq:gaps; do
    IFS=: read -r b m d <<< "$cell"
    python examples/bo_driven/workflow_driver.py \
        --config examples/bo_driven/config_full.yaml \
        --output $R --rundir $G/rundir --max_tasks 1 \
        --cells "$cell" >> $G/driver_duq_rerun.log 2>&1
    echo "S3_CELL_DONE $cell" >> $G/driver_duq_rerun.log
    python examples/metric_evaluation/evaluate_metrics.py \
        --results_dir $R --config_file examples/bo_driven/config_full.yaml \
        --benchmark "$b" --dataset "$d" --method "$m" \
        --output "$G/artifacts/evalmetrics_${b}_${d}_${m}.csv" \
        >> $G/posthoc_duq_rerun.log 2>&1 \
        || echo "EVALM FAILED $cell" >> $G/posthoc_duq_rerun.log
    # provenance only — do NOT bank_cell.sh these reruns: the committed
    # grid artifacts for cells 34-37/42-46 are the round-3 runs and must
    # not be clobbered; the rerun exists to give evaluate_metrics a live
    # model tree
    last=$(ls -d $R/$b/$d/$m/bo_trial_* 2>/dev/null | sort -V | tail -1)
    [ -n "$last" ] && cp "$last/trial_results.csv" \
        "$G/artifacts/trialresults_rerun_${b}_${d}_${m}.csv"
done
echo S3_DUQ_RERUNS_DONE >> $G/driver_duq_rerun.log

# extension cells (VERDICT r3 item 9): mve on a real-data benchmark —
# run AFTER the grid-closing work; these bank normally (new cells)
for cell in airfoil:mve:tails airfoil:mve:gaps; do
    IFS=: read -r b m d <<< "$cell"
    python examples/bo_driven/workflow_driver.py \
        --config examples/bo_driven/config_full.yaml \
        --output $R --rundir $G/rundir --max_tasks 1 \
        --cells "$cell" >> $G/driver_mve.log 2>&1
    echo "S3_CELL_DONE $cell" >> $G/driver_mve.log
    bash experiments/grid_r3/bank_cell.sh "$b" "$m" "$d" \
        >> $G/bank_s3.log 2>&1 || echo "BANK FAILED $cell" >> $G/bank_s3.log
done
echo S3_CHIP_WINDOW_DONE >> $G/driver_mve.log
