#!/bin/bash
# Round-5 session-4 chip window C: the remaining window-B queue after
# the MVE leg moved to CPU (run_mve_cpu*.sh, all four cells banked).
# Order: binomial_options x ensemble x gaps first (VERDICT item 6 —
# the r2 twin cell took 2h26m), then the chip-scale KDE feasibility
# measurement (item 9, 1h cap), then binomial_options x mc_dropout x
# gaps with whatever chip time remains (partial progress banks via the
# restart contract + cumulative trial_results.csv).
set -u
cd /root/repo
G=experiments/grid_r5
G3=experiments/grid_r3
R=experiments/full_cell/results
CFG=examples/bo_driven/config_full.yaml
EM=examples/metric_evaluation/evaluate_metrics.py
mkdir -p $G/artifacts $G/rundir

run_cell() {  # run_cell bench method dset timeout_s
    local b=$1 m=$2 d=$3 to=$4
    timeout "$to" python examples/bo_driven/workflow_driver.py \
        --config $CFG --output $R --rundir $G/rundir --max_tasks 1 \
        --cells "$b:$m:$d" >> $G/driver_ext_r5.log 2>&1
    local rc=$?
    echo "R5C_CELL_DONE $b:$m:$d rc=$rc $(date -u +%H:%M:%S)"
    bash $G3/bank_cell.sh "$b" "$m" "$d" >> $G/bank_r5.log 2>&1 \
        || echo "BANK FAILED $b:$m:$d"
    python $EM --results_dir $R --config_file $CFG \
        --benchmark "$b" --dataset "$d" --method "$m" \
        --output "$G/artifacts/evalmetrics_${b}_${d}_${m}.csv" \
        >> $G/posthoc_r5.log 2>&1 \
        || echo "EVALM FAILED $b:$m:$d"
    echo "R5C_EVALM_DONE $b:$m:$d"
}

echo "R5C_START $(date -u +%H:%M:%S)"
run_cell binomial_options ensemble gaps 12600
echo R5C_ENSEMBLE_DONE

timeout 3600 python $G/kde_scale.py > $G/kde_scale.out 2> $G/kde_scale.err
echo "R5C_KDE_SCALE_DONE rc=$? $(date -u +%H:%M:%S)"

# mc_dropout gets whatever chip time remains; partial trials bank via
# the restart contract and the cumulative trial_results.csv
run_cell binomial_options mc_dropout gaps 14400
echo R5C_WINDOW_DONE
