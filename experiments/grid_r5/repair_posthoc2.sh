#!/bin/bash
# Round-5 window A repair #2: the two cells the close_posthoc queue lost
# to transients (minibude:pager:tails recon hit a tunnel
# FAILED_PRECONDITION; minibude:kde:gaps evalmetrics was terminated by a
# session boundary mid-pass), then the post-repair collate + flagship
# classify that the session end also cut off.
# Reference end-product contract:
#   /root/reference/examples/metric_evaluation/evaluate_metrics.py:261-296
#   /root/reference/examples/bo_driven/collate.py:175-192
set -u
cd "$(dirname "$0")/../.."
G4=experiments/grid_r4
G=experiments/grid_r5
R=experiments/full_cell/results
A=experiments/full_cell/artifacts
T=$G4/posthoc_tree
CFG=examples/bo_driven/config_full.yaml
CFG_KDE=examples/bo_driven/config_kde.yaml
EM=examples/metric_evaluation/evaluate_metrics.py

bank() {  # bank <bench> <method> <dset>
    local b=$1 m=$2 d=$3
    for td in $T/$b/$d/$m/bo_trial_*; do
        [ -f "$td/model.pth" ] || continue
        mkdir -p "$A/${b}_${m}_${d}/pareto_models/$(basename $td)"
        cp "$td/model.pth" "$A/${b}_${m}_${d}/pareto_models/$(basename $td)/"
        [ -f "$td/hparams.yaml" ] && \
            cp "$td/hparams.yaml" "$A/${b}_${m}_${d}/pareto_models/$(basename $td)/"
    done
    echo "R5_BANKED $b:$m:$d"
}

# 1. minibude:pager:tails — retry recon (1 Pareto trial) + evalm + bank
python $G4/reconstruct_pareto.py --cell minibude:pager:tails --config $CFG \
    >> $G/recon_r5.log 2>&1 \
    && echo "R5_RECON_DONE minibude:pager:tails" \
    || echo "RECON FAILED minibude:pager:tails"
python $EM --results_dir $T --config_file $CFG \
    --benchmark minibude --dataset tails --method pager \
    --output $G/artifacts/evalmetrics_minibude_tails_pager.csv \
    >> $G/posthoc_r5.log 2>&1 \
    && { echo "R5_EVALM_DONE minibude:pager:tails"; bank minibude pager tails; } \
    || echo "EVALM FAILED minibude:pager:tails"

# 2. minibude:kde:gaps — recon already done; retry evalm + bank
python $EM --results_dir $T --config_file $CFG_KDE \
    --benchmark minibude --dataset gaps --method kde \
    --output $G/artifacts/evalmetrics_minibude_gaps_kde.csv \
    >> $G/posthoc_r5.log 2>&1 \
    && { echo "R5_EVALM_DONE minibude:kde:gaps"; bank minibude kde gaps; } \
    || echo "EVALM FAILED minibude:kde:gaps"

# 3. post-repair full-grid collate (must postdate every banked cell)
python $G4/build_collate_tree.py --out $G/collate_tree \
    >> $G/posthoc_r5.log 2>&1
python examples/bo_driven/collate.py \
    --input $G/collate_tree \
    --output $G/artifacts/collate_full >> $G/posthoc_r5.log 2>&1 \
    && echo R5_COLLATE_DONE || echo COLLATE_FAILED

# 4. classify pass over the flagship cell's live tree (50 models)
python examples/bo_driven/classify_posthoc.py \
    --input $R --config $CFG \
    --benchmarks binomial_options --methods delta_uq \
    --output "$G/artifacts/classify_flagship" -p 0.8 \
    >> $G/posthoc_r5.log 2>&1 \
    && echo R5_CLASSIFY_FLAGSHIP_DONE || echo CLASSIFY_FLAGSHIP_FAILED

echo R5_REPAIR2_DONE
