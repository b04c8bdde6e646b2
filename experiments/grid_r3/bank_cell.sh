#!/bin/bash
# Bank a completed cell's committable artifacts (the 3 restart-contract
# files + the pareto export from the LAST bo_trial dir) into
# experiments/full_cell/artifacts/<bench>_<method>_<dset>/.
# Usage: bank_cell.sh <benchmark> <dataset> <method>
set -eu
cd /root/repo
B=$1; D=$2; M=$3
SRC=experiments/full_cell/results/$B/$D/$M
LAST=$(ls -d $SRC/bo_trial_* | awk -F_ '{print $NF, $0}' | sort -n | awk '{print $2}' | tail -1)
DST=experiments/full_cell/artifacts/${B}_${M}_${D}
mkdir -p "$DST"
for f in ax_client.json ax_client_optimization_step.json trial_results.csv \
         pareto_parameters.json; do
    [ -f "$LAST/$f" ] && cp "$LAST/$f" "$DST/"
done
echo "banked $LAST -> $DST"
ls "$DST"
