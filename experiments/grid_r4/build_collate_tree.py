"""Reconstruct a collate-able results tree from the banked cell artifacts.

The r3 host re-provision destroyed many cells' live results trees; the
restart-contract files survive in ``experiments/full_cell/artifacts/<bench>_
<method>_<dset>/`` (each holds the LAST trial's ax_client.json +
ax_client_optimization_step.json + trial_results.csv, and trial_results
accumulates every row of the cell).  ``collate.py`` walks
``<input>/<bench>/<dset>/<method>/bo_trial_*`` trees, so the full-grid
collate (the reference's end product, reference
``examples/bo_driven/collate.py``) needs those artifacts re-materialised
as a tree.  Banked artifacts are the single source of truth: every
complete cell is banked, so the shim covers the whole grid regardless of
which live trees survived.

Usage: python build_collate_tree.py [--artifacts DIR] [--out DIR]
"""
import argparse
import re
import shutil
from pathlib import Path

METHODS = ('mc_dropout', 'knn_kde', 'delta_uq', 'ensemble', 'mve', 'kde',
           'pager')
CONTRACT = ('ax_client.json', 'ax_client_optimization_step.json',
            'trial_results.csv')
# round-2 flagship cells were banked before the <bench>_ prefix convention
LEGACY_BENCH = 'binomial_options'


def parse_cell(name):
    """<bench>_<method>_<dset> (bench/method may contain underscores) or
    the legacy <method>_<dset> flagship form; None when not a cell."""
    # bench group is NON-greedy so 'ailerons_knn_kde_tails' parses as
    # (ailerons, knn_kde), not (ailerons_knn, kde)
    m = re.match(rf'^(?:(.+?)_)?({"|".join(METHODS)})_(tails|gaps)$', name)
    if not m:
        return None
    bench = m.group(1) or LEGACY_BENCH
    return bench, m.group(2), m.group(3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--artifacts',
                    default='experiments/full_cell/artifacts')
    ap.add_argument('--out', default='experiments/grid_r4/collate_tree')
    args = ap.parse_args()

    art = Path(args.artifacts)
    out = Path(args.out)
    n = 0
    for d in sorted(art.iterdir()):
        if not d.is_dir():
            continue
        cell = parse_cell(d.name)
        if cell is None:
            continue
        if not all((d / f).is_file() for f in CONTRACT):
            print(f'skip {d.name}: incomplete contract (partial cell)')
            continue
        bench, method, dset = cell
        dst = out / bench / dset / method / 'bo_trial_0'
        dst.mkdir(parents=True, exist_ok=True)
        for f in CONTRACT:
            shutil.copy(d / f, dst / f)
        n += 1
    print(f'collate tree: {n} cells -> {out}')


if __name__ == '__main__':
    main()
