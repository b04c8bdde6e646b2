#!/bin/bash
# Bank a completed cell's committable artifacts (the 3 restart-contract
# files + the pareto export from the last FINISHED bo_trial dir) into
# experiments/full_cell/artifacts/<bench>_<method>_<dset>/.
#
# Usage: bank_cell.sh <benchmark> <method> <dataset>
# (same field order as workflow_driver --cells bench:method:dataset —
# standardized in round 4; the old <benchmark> <dataset> <method> order
# is caught by the SRC existence check below and fails loudly.)
set -eu
cd /root/repo
B=$1; M=$2; D=$3
SRC=experiments/full_cell/results/$B/$D/$M
if [ ! -d "$SRC" ]; then
    echo "ERROR: no results dir $SRC (arg order is <benchmark> <method> <dataset>)" >&2
    exit 1
fi
# last trial dir that actually finished (has trial_results.csv), mirroring
# nnueehcs_tpu.utility's finished-trial contract — an interrupted cell must
# not bank a partial artifact set
LAST=$(for d in "$SRC"/bo_trial_*; do
           [ -f "$d/trial_results.csv" ] && echo "${d##*_} $d"
       done | sort -n | tail -1 | awk '{print $2}')
if [ -z "$LAST" ]; then
    echo "ERROR: no finished bo_trial (trial_results.csv) under $SRC" >&2
    exit 1
fi
DST=experiments/full_cell/artifacts/${B}_${M}_${D}
mkdir -p "$DST"
for f in ax_client.json ax_client_optimization_step.json trial_results.csv; do
    if [ ! -f "$LAST/$f" ]; then
        echo "ERROR: contract file $f missing in $LAST — not banking" >&2
        exit 1
    fi
    cp "$LAST/$f" "$DST/"
done
# pareto export is written by the driver's final collate step; optional
# but its absence is worth a loud note
if [ -f "$LAST/pareto_parameters.json" ]; then
    cp "$LAST/pareto_parameters.json" "$DST/"
else
    echo "WARN: pareto_parameters.json absent in $LAST (banked without it)" >&2
fi
echo "banked $LAST -> $DST"
ls "$DST"

# Bank the Pareto trials' model bundles too (round-4 addition): two host
# re-provisions have now destroyed live trees before evaluate_metrics
# could run over them, and evaluate_metrics only needs the Pareto-optimal
# models (examples/metric_evaluation/evaluate_metrics.py).  A handful of
# ~0.5 MB bundles per cell keeps the post-hoc layer re-runnable from the
# banked artifacts alone.
if [ -f "$LAST/pareto_parameters.json" ]; then
    python - "$SRC" "$LAST" "$DST" <<'PYEOF'
import json, shutil, sys
from pathlib import Path
src, last, dst = map(Path, sys.argv[1:4])
trials = json.load(open(last / 'pareto_parameters.json'))['results'].keys()
for t in trials:
    tdir = src / f'bo_trial_{t}'
    out = dst / 'pareto_models' / f'bo_trial_{t}'
    out.mkdir(parents=True, exist_ok=True)
    for f in ('model.pth', 'hparams.yaml'):
        if (tdir / f).exists():
            shutil.copy2(tdir / f, out / f)
        else:
            print(f'WARN: {tdir / f} missing', file=sys.stderr)
print(f'banked pareto models for trials {sorted(trials)}')
PYEOF
fi
