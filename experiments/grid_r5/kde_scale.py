"""Chip-scale KDE-family feasibility measurement (VERDICT r4 item 9).

The question: can a binomial_options x {kde, knn_kde} x tails cell run
at the reference's 16.7M-row corpus?  The fit corpus is bounded by the
epoch-0 capture window (limit_train_batches 1000 x batch 128 = 128k
rows — reference KDEFitCallback semantics, nnueehcs/models.py:225-240),
but every timed UE pass still sweeps the full query set against it:
combined 16.7M x 128k = 2.1e12 pairs/pass, and the reference protocol
runs ~60 such passes per BO trial (driver warmup+timing + metric
evaluation, reference bo.py:229-254 + evaluation.py:416-449).

This script measures ONE real BO trial of the kde cell end-to-end at
the full corpus (a derived config: config_kde.yaml with the
binomial_options datasets pointed at binomial_options_full.h5 and
trials=1), plus single-pass UE timings for kde and knn_kde at the full
query shapes, then prints the 50-trial extrapolation the feasibility
note needs.

Output: experiments/grid_r5/kde_scale.out (stdout) + the scratch trial
tree under experiments/grid_r5/kde_scale_results/.
"""
import os
import subprocess
import sys
import time

os.chdir('/root/repo')
sys.path.insert(0, '/root/repo')

import numpy as np
import yaml

G = 'experiments/grid_r5'
SCRATCH_CFG = f'{G}/config_kde_full_scale.yaml'
OUT_DIR = f'{G}/kde_scale_results'


def make_config():
    with open('examples/bo_driven/config_kde.yaml') as f:
        cfg = yaml.safe_load(f)
    for split in cfg['benchmarks']['binomial_options']['datasets'].values():
        split['path'] = 'examples/data/binomial_options_full.h5'
    cfg['bo_config']['trials'] = 1
    cfg['bo_config']['max_failures'] = 1
    with open(SCRATCH_CFG, 'w') as f:
        yaml.safe_dump(cfg, f)
    return cfg


def one_trial_kde():
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, 'examples/bo_driven/bo.py',
         '--benchmark', 'binomial_options', '--uq_method', 'kde',
         '--config', SCRATCH_CFG, '--dataset', 'tails',
         '--output', OUT_DIR],
        capture_output=True, text=True, timeout=2700)
    wall = time.time() - t0
    tail = '\n'.join(r.stdout.splitlines()[-6:])
    print(f'kde 1-trial cell: rc={r.returncode} wall={wall:.0f}s\n{tail}')
    if r.returncode:
        print('STDERR tail:', '\n'.join(r.stderr.splitlines()[-10:]))
    return wall


def single_pass_timings():
    """Direct UE-pass timings for kde and knn_kde at the full query
    shapes against a 128k-row fit corpus (the epoch-0 capture bound)."""
    import jax.numpy as jnp
    from nnueehcs_tpu.model_builder import (KDEModelBuilder,
                                            KNNKDEModelBuilder)
    from nnueehcs_tpu.utils.timing import device_sync

    arch = [{'Linear': {'args': [5, 128]}},
            {'BatchNorm1d': {'args': [128]}}, {'ReLU': {}},
            {'Linear': {'args': [128, 1]}}]
    rng = np.random.default_rng(0)
    corpus = rng.random((128000, 5)).astype(np.float32)
    for name, builder, descr in [
            ('kde', KDEModelBuilder, {'rtol': 1000}),
            ('knn_kde', KNNKDEModelBuilder, {'k': 400})]:
        model = builder(arch, descr,
                        train_config={'loss': 'l1_loss'}).build()
        model.fit_kde(corpus)
        model.eval()
        for label, n in [('ood 5.0M', 5_033_165),
                         ('combined 16.8M', 16_777_216)]:
            x = jnp.asarray(rng.random((n, 5)), jnp.float32)
            device_sync(model(x, return_ue=True))      # compile+warm
            t0 = time.time()
            device_sync(model(x, return_ue=True))
            dt = time.time() - t0
            pairs = n * len(corpus)
            print(f'{name} UE pass [{label} x 128k corpus]: {dt:.2f}s  '
                  f'{pairs / dt / 1e9:.1f} Gpairs/s  '
                  f'{n / dt / 1e6:.2f}M samples/s')
            del x


def main():
    make_config()
    print('# single-pass timings at full query scale')
    single_pass_timings()
    print('\n# one real kde BO trial at the full corpus')
    wall = one_trial_kde()
    print(f'\n# extrapolation: 50-trial cell ~= {50 * wall / 3600:.1f} h '
          f'on one chip (+ BO/restart overhead)')


if __name__ == '__main__':
    main()
