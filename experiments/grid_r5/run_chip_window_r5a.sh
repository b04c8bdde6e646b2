#!/bin/bash
# Round-5 chip window A: perf attribution + f32 spot-check.
# Waits for the post-hoc closing queue (close_posthoc.sh) to release the
# chip, then runs, in order:
#   1. attrib_eval.py   — fused-eval kernel decomposition (VERDICT item 2)
#   2. attrib_train.py  — fused-epoch kernel decomposition (VERDICT item 5)
#   3. f32_spotcheck.py — flagship bf16-eval drift table (VERDICT item 4)
# Cell runs (VERDICT item 6) go in window B after these results are read.
set -u
cd /root/repo
G=experiments/grid_r5

# wait for the queue sentinel (poll close_posthoc.out; the queue writes
# R5_CLOSE_POSTHOC_DONE as its last line)
for i in $(seq 1 720); do
    grep -q R5_CLOSE_POSTHOC_DONE $G/close_posthoc.out 2>/dev/null && break
    sleep 30
done
grep -q R5_CLOSE_POSTHOC_DONE $G/close_posthoc.out 2>/dev/null \
    || { echo "QUEUE NEVER FINISHED — aborting window A"; exit 1; }
echo "R5A_START $(date -u +%H:%M:%S)"

# repair pass: two queue cells produced FAILED-row CSVs from transient
# causes (minibude tails ensemble ran against the pre-737d996 working
# tree missing base.py's `import os`; minibude gaps mc_dropout collided
# with a concurrent chip probe -> FAILED_PRECONDITION).  The code is
# fixed / the probe is gone — delete and re-run those two evalm passes.
EM=examples/metric_evaluation/evaluate_metrics.py
T=experiments/grid_r4/posthoc_tree
CFG=examples/bo_driven/config_full.yaml
for cell in "minibude tails ensemble" "minibude gaps mc_dropout"; do
    set -- $cell
    out="$G/artifacts/evalmetrics_${1}_${2}_${3}.csv"
    if grep -q FAILED "$out" 2>/dev/null; then
        rm -f "$out"
        timeout 2400 python $EM --results_dir $T --config_file $CFG \
            --benchmark "$1" --dataset "$2" --method "$3" \
            --output "$out" >> $G/posthoc_r5.log 2>&1 \
            && echo "R5A_REPAIR_DONE $1:$3:$2" \
            || echo "R5A_REPAIR_FAILED $1:$3:$2"
    fi
done

timeout 2400 python $G/attrib_eval.py > $G/attrib_eval.out 2> $G/attrib_eval.err
echo "R5A_ATTRIB_EVAL_DONE rc=$? $(date -u +%H:%M:%S)"

timeout 2400 python $G/attrib_train.py > $G/attrib_train.out 2> $G/attrib_train.err
echo "R5A_ATTRIB_TRAIN_DONE rc=$? $(date -u +%H:%M:%S)"

timeout 2400 python $G/f32_spotcheck.py > $G/f32_spotcheck.out 2> $G/f32_spotcheck.err
echo "R5A_SPOTCHECK_DONE rc=$? $(date -u +%H:%M:%S)"

echo R5A_WINDOW_DONE
