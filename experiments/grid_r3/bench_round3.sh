#!/bin/bash
# End-of-round on-chip measurement battery. Run ONLY with the chip free
# (grid stopped). Each workload now reports median-of-7 reps + spread and
# compares against bench_history.json (REGRESSION WARNING on drift beyond
# the noise band).
set -u
cd "$(dirname "$0")/../.."
LOG=experiments/grid_r3/bench_round3.log
: > "$LOG"
run() { echo "=== $* ===" >> "$LOG"; timeout 900 "$@" >> "$LOG" 2>&1; }

run python bench.py                                       # f32 headline
run python bench.py --precision bf16-mixed                # bf16 fused eval (new)
run python bench.py --workload mc_dropout
run python bench.py --workload mve                        # fastest UE method
run python bench.py --workload delta_uq --batch 65536   # grid cost driver
run python bench.py --workload delta_uq --batch 65536 --precision bf16-mixed
run python bench.py --workload ensemble_train_epoch       # fused kernel MFU
run python bench.py --workload mcd_train_epoch
run python bench.py --workload ensemble_train --precision bf16-mixed
# non-parity large-batch point: validates BENCHMARKS.md's MFU-ceiling
# analysis (≥20% MFU predicted at batch 512-1024; parity cells stay 128)
run python bench.py --workload ensemble_train --precision bf16-mixed --batch 1024
echo DONE >> "$LOG"
tail -40 "$LOG"
