"""Control probe for the 128k-corpus stall seen in kde_probe.py.

Runs the known-good round-4 shape first (16k fit rows x 262k queries —
benched at 5.6M samples/s in BENCHMARKS.md) as a tunnel-health control,
then grows the corpus 16k -> 32k -> 64k -> 128k at a fixed 262k query
size. Wherever the first stall appears attributes the kde_scale.py /
kde_probe.py hang to either corpus scale or tunnel state.
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
from nnueehcs_tpu.model_builder import KDEModelBuilder  # noqa: E402
from nnueehcs_tpu.utils.timing import device_sync  # noqa: E402

ARCH = [{'Linear': {'args': [5, 128]}},
        {'BatchNorm1d': {'args': [128]}}, {'ReLU': {}},
        {'Linear': {'args': [128, 1]}}]
N_QUERY = 262_144

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((N_QUERY, 5)), jnp.float32)

for corpus_rows in [16_000, 32_000, 64_000, 128_000]:
    corpus = rng.random((corpus_rows, 5)).astype(np.float32)
    model = KDEModelBuilder(ARCH, {'rtol': 1000},
                            train_config={'loss': 'l1_loss'}).build()
    say(f'fit_kde on {corpus_rows} rows')
    model.fit_kde(corpus)
    model.eval()
    say(f'compile+warm pass [{N_QUERY} x {corpus_rows}]')
    device_sync(model(x, return_ue=True))
    say('timed pass')
    t0 = time.time()
    device_sync(model(x, return_ue=True))
    dt = time.time() - t0
    pairs = N_QUERY * corpus_rows
    say(f'kde UE pass [{N_QUERY} x {corpus_rows}]: {dt:.2f}s  '
        f'{pairs / dt / 1e9:.1f} Gpairs/s  {N_QUERY / dt / 1e6:.2f}M samples/s')

say('probe2 complete')
