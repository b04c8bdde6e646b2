"""Profiling/observability helpers.

The reference measures performance purely in-band (timed metric classes,
CUDA peak-allocator stats — reference ``nnueehcs/evaluation.py:383-516``).
On TPU the same metric surface exists (:mod:`nnueehcs_tpu.evaluation`), and
this module adds the idiomatic extras: an XLA profiler trace context for
inspecting compiled programs in TensorBoard/Perfetto, and device memory
snapshots.
"""
from __future__ import annotations

import contextlib
import jax


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """``with profile_trace('logs/profile'): ...`` — captures an XLA/TPU
    profiler trace viewable in TensorBoard or Perfetto."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for host-side phases inside a profile."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> dict:
    """Allocator statistics for a device ({} when the backend exposes
    none, e.g. CPU)."""
    device = device or jax.devices()[0]
    try:
        return dict(device.memory_stats() or {})
    except Exception:
        return {}


def live_array_bytes() -> int:
    """Total bytes of live jax arrays in this process."""
    return sum(int(a.size * a.dtype.itemsize) for a in jax.live_arrays())
