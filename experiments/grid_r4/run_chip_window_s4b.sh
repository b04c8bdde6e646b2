#!/bin/bash
# Round-4 session-4 second chip window. Run AFTER run_chip_window_s4.sh.
# Extension cells beyond the reference's 48-cell active grid:
#   1. minibude/puma x mve x {tails,gaps} — completes the MVE method's
#      story on every benchmark (airfoil + ailerons done by this point);
#   2. binomial_options x {ensemble, mc_dropout} x gaps — extends the
#      flagship benchmark's split coverage (its tails cells are banked
#      from r1/r2). Cheap relative to the delta_uq flagship: no anchored
#      timed-eval protocol.
# Every cell banks + gets its evalmetrics pass immediately (the two host
# re-provisions taught us: bank-as-you-go).
set -u
cd /root/repo
G=experiments/grid_r4
R=experiments/full_cell/results
CFG=examples/bo_driven/config_full.yaml
EM=examples/metric_evaluation/evaluate_metrics.py

run_cell() {  # run_cell bench method dset
    local b=$1 m=$2 d=$3
    python examples/bo_driven/workflow_driver.py \
        --config $CFG --output $R --rundir $G/rundir --max_tasks 1 \
        --cells "$b:$m:$d" >> $G/driver_ext_s4.log 2>&1
    echo "S4B_CELL_DONE $b:$m:$d" >> $G/driver_ext_s4.log
    bash experiments/grid_r3/bank_cell.sh "$b" "$m" "$d" \
        >> $G/bank_s4.log 2>&1 || echo "BANK FAILED $b:$m:$d" >> $G/bank_s4.log
    python $EM --results_dir $R --config_file $CFG \
        --benchmark "$b" --dataset "$d" --method "$m" \
        --output "$G/artifacts/evalmetrics_${b}_${d}_${m}.csv" \
        >> $G/posthoc_s4.log 2>&1 \
        || echo "EVALM FAILED $b:$m:$d" >> $G/posthoc_s4.log
}

run_cell minibude mve tails
run_cell minibude mve gaps
run_cell puma mve tails
run_cell puma mve gaps
echo S4B_MVE_DONE >> $G/driver_ext_s4.log

run_cell binomial_options mc_dropout gaps
run_cell binomial_options ensemble gaps
echo S4B_CHIP_WINDOW_DONE
