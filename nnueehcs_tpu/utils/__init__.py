"""Shared utilities: timing/synchronisation, profiling."""
from .timing import device_sync, timed_passes
from .profiling import (profile_trace, annotate, device_memory_stats,
                        live_array_bytes)

__all__ = ['device_sync', 'timed_passes', 'profile_trace', 'annotate',
           'device_memory_stats', 'live_array_bytes']
