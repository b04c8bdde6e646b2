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

# repair pass: re-run every evalm the queue lost to transient causes —
# FAILED-row CSVs (one cell ran against the pre-737d996 working tree
# missing base.py's `import os`; one collided with a concurrent chip
# probe) and cells whose evalm hung on the tunnel and was killed
# (EVALM FAILED lines in close_posthoc.out).  Retro-bank afterwards
# (the queue skips banking when evalm fails).
EM=examples/metric_evaluation/evaluate_metrics.py
T=experiments/grid_r4/posthoc_tree
A=experiments/full_cell/artifacts
repair() {  # repair <bench> <dset> <method> <config>
    local b=$1 d=$2 m=$3 cfg=$4
    local out="$G/artifacts/evalmetrics_${b}_${d}_${m}.csv"
    if [ -f "$out" ] && ! grep -q FAILED "$out"; then
        echo "R5A_REPAIR_SKIP $b:$m:$d (clean CSV exists)"
    else
        rm -f "$out"
        timeout 2400 python $EM --results_dir $T --config_file "$cfg" \
            --benchmark "$b" --dataset "$d" --method "$m" \
            --output "$out" >> $G/posthoc_r5.log 2>&1 \
            && echo "R5A_REPAIR_DONE $b:$m:$d" \
            || { echo "R5A_REPAIR_FAILED $b:$m:$d"; return; }
    fi
    for td in $T/$b/$d/$m/bo_trial_*; do
        [ -f "$td/model.pth" ] || continue
        mkdir -p "$A/${b}_${m}_${d}/pareto_models/$(basename $td)"
        cp -n "$td/model.pth" \
            "$A/${b}_${m}_${d}/pareto_models/$(basename $td)/" 2>/dev/null
        [ -f "$td/hparams.yaml" ] && cp -n "$td/hparams.yaml" \
            "$A/${b}_${m}_${d}/pareto_models/$(basename $td)/" 2>/dev/null
    done
    echo "R5A_REBANKED $b:$m:$d"
}
repair minibude tails ensemble examples/bo_driven/config_full.yaml
repair minibude gaps mc_dropout examples/bo_driven/config_full.yaml
# recon-level repair: the queue's minibude:pager:tails reconstruction died
# on a transient TPU FailedPrecondition (tunnel glitch) before any model
# landed; re-run the reconstruction itself, then its evalm + rebank.
if [ ! -f "$G/artifacts/evalmetrics_minibude_tails_pager.csv" ]; then
    timeout 2400 python experiments/grid_r4/reconstruct_pareto.py \
        --cell minibude:pager:tails \
        --config examples/bo_driven/config_full.yaml \
        >> $G/recon_r5.log 2>&1 \
        && echo "R5A_RECON_REPAIR_DONE minibude:pager:tails" \
        || echo "R5A_RECON_REPAIR_FAILED minibude:pager:tails"
    repair minibude tails pager examples/bo_driven/config_full.yaml
fi
# every queue-reported evalm failure (hung-tunnel kills land here)
grep "EVALM FAILED" $G/close_posthoc.out 2>/dev/null | sort -u | \
while read -r _ _ cell; do
    b=${cell%%:*}; rest=${cell#*:}; m=${rest%%:*}; d=${rest#*:}
    case $m in kde|knn_kde) cfg=examples/bo_driven/config_kde.yaml ;;
                *) cfg=examples/bo_driven/config_full.yaml ;; esac
    repair "$b" "$d" "$m" "$cfg"
done
# collate must postdate the repaired cells: re-run it
python experiments/grid_r4/build_collate_tree.py --out $G/collate_tree \
    >> $G/posthoc_r5.log 2>&1
python examples/bo_driven/collate.py --input $G/collate_tree \
    --output $G/artifacts/collate_full >> $G/posthoc_r5.log 2>&1 \
    && echo R5A_COLLATE_DONE || echo R5A_COLLATE_FAILED

timeout 2400 python $G/attrib_eval.py > $G/attrib_eval.out 2> $G/attrib_eval.err
echo "R5A_ATTRIB_EVAL_DONE rc=$? $(date -u +%H:%M:%S)"

timeout 2400 python $G/attrib_train.py > $G/attrib_train.out 2> $G/attrib_train.err
echo "R5A_ATTRIB_TRAIN_DONE rc=$? $(date -u +%H:%M:%S)"

timeout 2400 python $G/f32_spotcheck.py > $G/f32_spotcheck.out 2> $G/f32_spotcheck.err
echo "R5A_SPOTCHECK_DONE rc=$? $(date -u +%H:%M:%S)"

echo R5A_WINDOW_DONE
