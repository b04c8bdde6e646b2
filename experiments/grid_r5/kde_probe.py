"""Incremental chip-scale KDE feasibility probe (VERDICT r4 item 9).

`kde_scale.py`'s monolithic pass produced no output in 16 min on the
tunneled chip (session 5); this probe does the same measurement
incrementally — per-step timestamps, flushed prints, growing query
sizes — so a stall is attributable and the pairs/s arithmetic for the
feasibility note survives even if the largest shape never finishes.

Measures: fit_kde on the 128k epoch-0 capture corpus (reference
KDEFitCallback bound, nnueehcs/models.py:225-240), then timed UE
passes at query sizes 262k / 1M / 5.03M (the binomial_options OOD
split) for kde and knn_kde.
"""
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

t_start = time.time()


def say(msg):
    print(f'[{time.time() - t_start:7.1f}s] {msg}', flush=True)


say('importing jax + builders')
import jax.numpy as jnp  # noqa: E402
from nnueehcs_tpu.model_builder import (KDEModelBuilder,  # noqa: E402
                                        KNNKDEModelBuilder)
from nnueehcs_tpu.utils.timing import device_sync  # noqa: E402

ARCH = [{'Linear': {'args': [5, 128]}},
        {'BatchNorm1d': {'args': [128]}}, {'ReLU': {}},
        {'Linear': {'args': [128, 1]}}]
CORPUS_ROWS = 128_000
QUERY_SIZES = [262_144, 1_048_576, 5_033_165]

rng = np.random.default_rng(0)
corpus = rng.random((CORPUS_ROWS, 5)).astype(np.float32)

for name, builder, descr in [
        ('kde', KDEModelBuilder, {'rtol': 1000}),
        ('knn_kde', KNNKDEModelBuilder, {'k': 400})]:
    say(f'{name}: build')
    model = builder(ARCH, descr, train_config={'loss': 'l1_loss'}).build()
    say(f'{name}: fit_kde on {CORPUS_ROWS} rows')
    model.fit_kde(corpus)
    model.eval()
    say(f'{name}: fit done')
    for n in QUERY_SIZES:
        x = jnp.asarray(rng.random((n, 5)), jnp.float32)
        say(f'{name}: compile+warm pass n={n}')
        device_sync(model(x, return_ue=True))
        say(f'{name}: timed pass n={n}')
        t0 = time.time()
        device_sync(model(x, return_ue=True))
        dt = time.time() - t0
        pairs = n * CORPUS_ROWS
        say(f'{name} UE pass [{n} x {CORPUS_ROWS}]: {dt:.2f}s  '
            f'{pairs / dt / 1e9:.1f} Gpairs/s  {n / dt / 1e6:.2f}M samples/s')
        del x

say('probe complete')
