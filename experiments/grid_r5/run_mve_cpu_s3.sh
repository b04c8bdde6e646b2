#!/bin/bash
# Round-5 session-3 CPU leg: the remaining extension cells (VERDICT
# item 6).  puma:mve:tails is banked (committed artifacts); the
# puma:mve:gaps run finished 50/50 in session 2 but was never banked
# before the host re-provision (results/ is gitignored), so it reruns
# here, followed by the two minibude cells.  Same pattern as
# run_mve_cpu.sh: nice -19, JAX_PLATFORMS=cpu for the evalm pass, bank
# + evalmetrics immediately after each cell.
set -u
cd "$(dirname "$0")/../.."
G=experiments/grid_r5
G3=experiments/grid_r3
R=experiments/full_cell/results
CFG=examples/bo_driven/config_full.yaml
EM=examples/metric_evaluation/evaluate_metrics.py
mkdir -p $G/artifacts $G/rundir

run_cell() {  # run_cell bench method dset timeout_s
    local b=$1 m=$2 d=$3 to=$4
    timeout "$to" nice -n 19 python examples/bo_driven/workflow_driver.py \
        --config $CFG --output $R --rundir $G/rundir --max_tasks 1 \
        --platform cpu --cells "$b:$m:$d" >> $G/driver_mve_cpu.log 2>&1
    local rc=$?
    echo "R5MVE_CELL_DONE $b:$m:$d rc=$rc $(date -u +%H:%M:%S)"
    bash $G3/bank_cell.sh "$b" "$m" "$d" >> $G/bank_r5.log 2>&1 \
        || echo "BANK FAILED $b:$m:$d"
    nice -n 19 env JAX_PLATFORMS=cpu python $EM --results_dir $R \
        --config_file $CFG \
        --benchmark "$b" --dataset "$d" --method "$m" \
        --output "$G/artifacts/evalmetrics_${b}_${d}_${m}.csv" \
        >> $G/posthoc_r5.log 2>&1 \
        && echo "R5MVE_EVALM_DONE $b:$m:$d" \
        || echo "EVALM FAILED $b:$m:$d"
}

echo "R5MVE_S3_START $(date -u +%H:%M:%S)"
run_cell puma mve gaps 7200
run_cell minibude mve tails 10800
run_cell minibude mve gaps 10800
echo R5MVE_S3_ALL_DONE
