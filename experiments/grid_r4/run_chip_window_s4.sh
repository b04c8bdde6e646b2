#!/bin/bash
# Round-4 session-4 chip window. Closes the post-hoc evalmetrics layer
# over the ENTIRE banked grid (VERDICT r3 item 3, last mile):
#   1. evalmetrics on the completed flagship cell's live tree;
#   2. reconstruct-Pareto + evalmetrics for every banked cell whose live
#      model tree died with the r3/r4-s1 host re-provisions (14 cells) —
#      reconstruction retrains just the Pareto trials from the banked
#      hyperparameters (deterministic: seed 42 fixed, trial number never
#      enters the seed), which is both cheaper and more faithful than the
#      previous whole-cell-rerun approach;
#   3. retro-bank the reconstructed Pareto model bundles so every banked
#      cell is post-hoc re-runnable from artifacts alone;
#   4. ailerons x mve x {tails,gaps} extension cells (VERDICT r3 item 9:
#      4 real-data MVE cells complete the story) + bank + evalmetrics.
set -u
cd /root/repo
G=experiments/grid_r4
R=experiments/full_cell/results
A=experiments/full_cell/artifacts
T=$G/posthoc_tree
CFG=examples/bo_driven/config_full.yaml
CFG_KDE=examples/bo_driven/config_kde.yaml
EM=examples/metric_evaluation/evaluate_metrics.py

# 1. flagship evalmetrics (live tree intact, Pareto trial is 5-anchor)
python $EM --results_dir $R --config_file $CFG \
    --benchmark binomial_options --dataset tails --method delta_uq \
    --output "$G/artifacts/evalmetrics_binomial_options_tails_delta_uq.csv" \
    >> $G/posthoc_s4.log 2>&1 \
    || echo "EVALM FAILED flagship" >> $G/posthoc_s4.log
echo S4_FLAGSHIP_EVALM_DONE >> $G/posthoc_s4.log

# 2+3. reconstruct + evalmetrics + retro-bank models
recon() {  # recon <bench> <method> <dset> <config> [banked-dir-override]
    local b=$1 m=$2 d=$3 cfg=$4 bank=${5:-${1}_${2}_${3}}
    local extra=""
    [ -n "${5:-}" ] && extra="--banked $5"
    python $G/reconstruct_pareto.py --cell "$b:$m:$d" --config "$cfg" \
        $extra >> $G/recon_s4.log 2>&1 \
        || { echo "RECON FAILED $b:$m:$d" >> $G/recon_s4.log; return 1; }
    python $EM --results_dir $T --config_file "$cfg" \
        --benchmark "$b" --dataset "$d" --method "$m" \
        --output "$G/artifacts/evalmetrics_${b}_${d}_${m}.csv" \
        >> $G/posthoc_s4.log 2>&1 \
        || echo "EVALM FAILED $b:$m:$d" >> $G/posthoc_s4.log
    # retro-bank the reconstructed Pareto bundles (bank_cell.sh policy)
    for td in $T/$b/$d/$m/bo_trial_*; do
        [ -f "$td/model.pth" ] || continue
        mkdir -p "$A/$bank/pareto_models/$(basename $td)"
        cp "$td/model.pth" "$A/$bank/pareto_models/$(basename $td)/"
        [ -f "$td/hparams.yaml" ] && \
            cp "$td/hparams.yaml" "$A/$bank/pareto_models/$(basename $td)/"
    done
    echo "S4_RECON_DONE $b:$m:$d" >> $G/recon_s4.log
}

recon puma kde gaps $CFG_KDE
recon puma delta_uq tails $CFG
recon puma delta_uq gaps $CFG
recon puma ensemble gaps $CFG
recon ailerons delta_uq tails $CFG
recon ailerons delta_uq gaps $CFG
recon minibude delta_uq tails $CFG
recon minibude ensemble tails $CFG
recon minibude ensemble gaps $CFG
recon minibude mc_dropout tails $CFG
recon minibude mc_dropout gaps $CFG
recon minibude pager tails $CFG
recon binomial_options ensemble tails $CFG ensemble_tails
recon binomial_options mve tails $CFG mve_tails
# puma kde tails already reconstructed+evaluated in the session prologue;
# retro-bank its bundle too
for td in $T/puma/tails/kde/bo_trial_*; do
    [ -f "$td/model.pth" ] || continue
    mkdir -p "$A/puma_kde_tails/pareto_models/$(basename $td)"
    cp "$td/model.pth" "$A/puma_kde_tails/pareto_models/$(basename $td)/"
done
echo S4_RECON_ALL_DONE >> $G/recon_s4.log

# 4. extension cells: ailerons x mve x {tails,gaps}
for cell in ailerons:mve:tails ailerons:mve:gaps; do
    IFS=: read -r b m d <<< "$cell"
    python examples/bo_driven/workflow_driver.py \
        --config $CFG --output $R --rundir $G/rundir --max_tasks 1 \
        --cells "$cell" >> $G/driver_mve_s4.log 2>&1
    echo "S4_CELL_DONE $cell" >> $G/driver_mve_s4.log
    bash experiments/grid_r3/bank_cell.sh "$b" "$m" "$d" \
        >> $G/bank_s4.log 2>&1 || echo "BANK FAILED $cell" >> $G/bank_s4.log
    python $EM --results_dir $R --config_file $CFG \
        --benchmark "$b" --dataset "$d" --method "$m" \
        --output "$G/artifacts/evalmetrics_${b}_${d}_${m}.csv" \
        >> $G/posthoc_s4.log 2>&1 \
        || echo "EVALM FAILED $cell" >> $G/posthoc_s4.log
done
echo S4_CHIP_WINDOW_DONE
