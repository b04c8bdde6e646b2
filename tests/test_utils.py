"""utils tests: device-sync timing, profiling helpers, multihost info."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from nnueehcs_tpu.utils import (device_sync, timed_passes, profile_trace,
                                device_memory_stats, live_array_bytes)
from nnueehcs_tpu.parallel.multihost import is_multihost, process_info


def test_device_sync_pytree():
    out = (jnp.ones((4, 4)), {'a': jnp.zeros(3)}, 1.5)
    assert device_sync(out) is out


def test_timed_passes_counts():
    calls = []

    def fn():
        calls.append(1)
        return jnp.ones(2)

    times = timed_passes(fn, num_warmup=2, num_trials=5)
    assert len(calls) == 7
    assert times.shape == (5,)
    assert np.all(times >= 0)


def test_profile_trace_writes(tmp_path):
    d = str(tmp_path / 'prof')
    with profile_trace(d):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert os.path.isdir(d)
    assert any(os.scandir(d))


def test_profile_trace_disabled(tmp_path):
    d = str(tmp_path / 'noprof')
    with profile_trace(d, enabled=False):
        pass
    assert not os.path.exists(d)


def test_memory_helpers():
    stats = device_memory_stats()
    assert isinstance(stats, dict)
    x = jnp.ones((128, 128))
    assert live_array_bytes() >= x.size * x.dtype.itemsize


def test_multihost_info_single_process():
    assert not is_multihost()
    info = process_info()
    assert info['process_count'] == 1
    assert info['global_devices'] == 8   # virtual mesh from conftest
