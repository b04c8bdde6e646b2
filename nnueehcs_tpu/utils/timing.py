"""Reliable device timing.

``jax.block_until_ready`` can acknowledge optimistically on tunneled /
remote PJRT platforms (observed on the axon TPU plugin: sub-hardware-
latency "completions" until a host transfer occurs).  ``device_sync``
forces completion by fetching a tiny slice of each output buffer to the
host — the only barrier that held up under measurement.

``timed_passes`` implements the reference's measurement protocol (warmup +
timed trials, device-synchronised — reference ``nnueehcs/evaluation.py:
431-449``) on top of it, timing each trial individually.
"""
from __future__ import annotations

import time
from typing import Callable

import numpy as np

import jax


def device_sync(out):
    """Block until ``out`` (array or pytree) has actually materialised."""
    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        if hasattr(leaf, 'addressable_shards') or hasattr(leaf, 'devices'):
            # fetch a single element; forces the producing computation to
            # complete even on platforms with optimistic ready signals
            np.asarray(leaf.ravel()[:1])
        # host values need no sync
    return out


def timed_passes(fn: Callable[[], object], num_warmup: int, num_trials: int):
    """Run ``fn`` with warmup then per-trial wall-clock timing; returns an
    array of per-trial seconds."""
    for _ in range(num_warmup):
        device_sync(fn())
    times = np.zeros(num_trials)
    for i in range(num_trials):
        start = time.perf_counter()
        device_sync(fn())
        times[i] = time.perf_counter() - start
    return times
