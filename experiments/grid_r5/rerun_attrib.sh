#!/bin/bash
# Re-run the two attribution batteries after the fe2ae1d fixes (outT
# numerics gate, fori-loop unroll).  Waits for window A to release the
# chip (it is finishing f32_spotcheck.py), then runs both.
set -u
cd "$(dirname "$0")/../.."
G=experiments/grid_r5

for i in $(seq 1 240); do
    grep -q R5A_WINDOW_DONE $G/window_a.out 2>/dev/null && break
    sleep 30
done
grep -q R5A_WINDOW_DONE $G/window_a.out 2>/dev/null \
    || { echo "WINDOW A NEVER FINISHED — aborting"; exit 1; }

timeout 2400 python $G/attrib_eval.py > $G/attrib_eval.out 2> $G/attrib_eval.err
echo "RERUN_ATTRIB_EVAL_DONE rc=$? $(date -u +%H:%M:%S)"

timeout 2400 python $G/attrib_train.py > $G/attrib_train.out 2> $G/attrib_train.err
echo "RERUN_ATTRIB_TRAIN_DONE rc=$? $(date -u +%H:%M:%S)"

echo RERUN_ATTRIB_DONE
