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
