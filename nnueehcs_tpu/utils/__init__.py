"""Shared utilities: timing/synchronisation, profiling."""
from .timing import device_sync, timed_passes

__all__ = ['device_sync', 'timed_passes']
