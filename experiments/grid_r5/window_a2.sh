#!/bin/bash
# Round-5 window A continuation: repair the two FAILED-row evalmetrics
# cells (minibude:tails:ensemble ran against the pre-737d996 tree missing
# base.py's `import os`; minibude:gaps:mc_dropout hit a tunnel
# FailedPrecondition), recollate, then the perf-attribution battery
# (VERDICT items 2, 5) and the flagship f32 spot-check (item 4).
set -u
cd "$(dirname "$0")/../.."
G=experiments/grid_r5
T=experiments/grid_r4/posthoc_tree
A=experiments/full_cell/artifacts
EM=examples/metric_evaluation/evaluate_metrics.py
CFG=examples/bo_driven/config_full.yaml

repair() {  # repair <bench> <dset> <method>
    local b=$1 d=$2 m=$3
    local out="$G/artifacts/evalmetrics_${b}_${d}_${m}.csv"
    rm -f "$out"
    timeout 2400 python $EM --results_dir $T --config_file $CFG \
        --benchmark "$b" --dataset "$d" --method "$m" \
        --output "$out" >> $G/posthoc_r5.log 2>&1 \
        && echo "R5A2_REPAIR_DONE $b:$m:$d" \
        || { echo "R5A2_REPAIR_FAILED $b:$m:$d"; return 1; }
    for td in $T/$b/$d/$m/bo_trial_*; do
        [ -f "$td/model.pth" ] || continue
        mkdir -p "$A/${b}_${m}_${d}/pareto_models/$(basename $td)"
        cp "$td/model.pth" "$A/${b}_${m}_${d}/pareto_models/$(basename $td)/"
        [ -f "$td/hparams.yaml" ] && \
            cp "$td/hparams.yaml" "$A/${b}_${m}_${d}/pareto_models/$(basename $td)/"
    done
    echo "R5A2_REBANKED $b:$m:$d"
}

repair minibude tails ensemble
repair minibude gaps mc_dropout

# collate must postdate the repaired cells
python experiments/grid_r4/build_collate_tree.py --out $G/collate_tree \
    >> $G/posthoc_r5.log 2>&1
python examples/bo_driven/collate.py --input $G/collate_tree \
    --output $G/artifacts/collate_full >> $G/posthoc_r5.log 2>&1 \
    && echo R5A2_COLLATE_DONE || echo R5A2_COLLATE_FAILED

timeout 2400 python $G/attrib_eval.py > $G/attrib_eval.out 2> $G/attrib_eval.err
echo "R5A2_ATTRIB_EVAL_DONE rc=$? $(date -u +%H:%M:%S)"

timeout 2400 python $G/attrib_train.py > $G/attrib_train.out 2> $G/attrib_train.err
echo "R5A2_ATTRIB_TRAIN_DONE rc=$? $(date -u +%H:%M:%S)"

timeout 2400 python $G/f32_spotcheck.py > $G/f32_spotcheck.out 2> $G/f32_spotcheck.err
echo "R5A2_SPOTCHECK_DONE rc=$? $(date -u +%H:%M:%S)"

echo R5A2_WINDOW_DONE
