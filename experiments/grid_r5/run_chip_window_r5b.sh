#!/bin/bash
# Round-5 chip window B: the r4-endgame extension cells (VERDICT item 6)
# + the chip-scale KDE feasibility measurement (VERDICT item 9).
# Order: cheap MVE cells first (65k/8k-row benchmarks), then the
# 16.7M-row binomial_options gaps cells (ensemble before mc_dropout —
# mc_dropout's slower UE protocol makes it the cell most likely to be
# cut by the round boundary, so it goes last and banks partial progress
# through the restart contract).  Every cell banks + evalmetrics
# immediately (bank-as-you-go policy from the r4 re-provisions).
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
    echo "R5B_CELL_DONE $b:$m:$d rc=$rc $(date -u +%H:%M:%S)"
    bash $G3/bank_cell.sh "$b" "$m" "$d" >> $G/bank_r5.log 2>&1 \
        || echo "BANK FAILED $b:$m:$d"
    python $EM --results_dir $R --config_file $CFG \
        --benchmark "$b" --dataset "$d" --method "$m" \
        --output "$G/artifacts/evalmetrics_${b}_${d}_${m}.csv" \
        >> $G/posthoc_r5.log 2>&1 \
        || echo "EVALM FAILED $b:$m:$d"
    echo "R5B_EVALM_DONE $b:$m:$d"
}

echo "R5B_START $(date -u +%H:%M:%S)"
run_cell minibude mve tails 5400
run_cell minibude mve gaps 5400
run_cell puma mve tails 5400
run_cell puma mve gaps 5400
echo R5B_MVE_DONE

# chip-scale KDE feasibility: ONE full-budget trial at the 16.7M-row
# corpus, extrapolated in the note (experiments/grid_r5/kde_scale.py)
timeout 3600 python $G/kde_scale.py > $G/kde_scale.out 2> $G/kde_scale.err
echo "R5B_KDE_SCALE_DONE rc=$? $(date -u +%H:%M:%S)"

run_cell binomial_options ensemble gaps 14400
echo R5B_ENSEMBLE_DONE

# mc_dropout gets whatever chip time remains; partial trials bank via
# the restart contract and the cumulative trial_results.csv
run_cell binomial_options mc_dropout gaps 14400
echo R5B_WINDOW_DONE
