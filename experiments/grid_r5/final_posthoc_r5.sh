#!/bin/bash
# Round-5 end-of-round post-hoc refresh: rebuild the collate tree from
# the banked artifacts (now including cells 57-60 and whatever window C
# banked) and regenerate the full-grid collate so summary.csv postdates
# every banked cell — the r4 judge's staleness check.
set -u
cd /root/repo
G=experiments/grid_r5
G4=experiments/grid_r4

python $G4/build_collate_tree.py --out $G/collate_tree \
    >> $G/posthoc_r5.log 2>&1
python examples/bo_driven/collate.py \
    --input $G/collate_tree \
    --output $G/artifacts/collate_full >> $G/posthoc_r5.log 2>&1 \
    && echo R5_FINAL_COLLATE_DONE || echo FINAL_COLLATE_FAILED
ls -la $G/artifacts/collate_full/summary.csv
