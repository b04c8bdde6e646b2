"""Multi-host (DCN) initialisation helpers.

Single-host meshes need nothing — ``jax.devices()`` already sees every
local chip and collectives ride ICI.  To span hosts (a TPU pod slice or
multi-host GPU cluster) JAX needs the distributed runtime initialised
before first use; afterwards the same :func:`nnueehcs_tpu.parallel.make_mesh`
calls build global meshes over ``jax.devices()`` and XLA routes
inter-host collectives over DCN.

The reference has no multi-host story at all (its fan-out is
one-process-per-GPU via SLURM, reference ``workflow_driver.py``); this
module is the hook for scaling a *single* trial past one host.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialise ``jax.distributed``.

    With no arguments, relies on the environment (TPU pod runtimes and
    SLURM set the coordination variables automatically).  Explicit values
    follow ``jax.distributed.initialize`` semantics.  Safe to call when
    already initialised (no-op).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:
        # double-init messages vary across jax versions: 'already
        # initialized' vs 'initialize should only be called once'
        msg = str(e).lower()
        if 'already' in msg or 'only be called once' in msg:
            return
        raise


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_info() -> dict:
    return {
        'process_index': jax.process_index(),
        'process_count': jax.process_count(),
        'local_devices': len(jax.local_devices()),
        'global_devices': len(jax.devices()),
    }
