"""Device-mesh sharding for training and UE evaluation.

The reference has no intra-model parallelism — every job is a single
process on one GPU (reference ``nnueehcs/training.py:25``,
``examples/bo_driven/bo.py:16-17``); scale-out is task-level only.  The
TPU-native framework instead scales a *single* trial across a chip mesh:

- **dp** axis: batch rows sharded across devices; XLA's SPMD partitioner
  inserts the gradient all-reduce over ICI automatically once the batch
  carries a ``P('dp')`` sharding and parameters are replicated,
- **member** axis: the stacked ensemble/MC member axis sharded across
  devices — each device trains/evaluates its own members (the UQ analogue
  of expert parallelism),
- UE evaluation batches are row-sharded the same way, so the
  (anchors × batch) and (samples × batch) UQ fan-outs ride the full mesh.

Everything goes through ``jax.sharding.NamedSharding`` + jit sharding
propagation — no hand-written collectives (the "let XLA insert collectives"
recipe).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Optional[Dict[str, int]] = None,
              devices=None) -> Mesh:
    """Build a mesh from an ``{axis: size}`` dict, e.g. ``{'dp': 4,
    'member': 2}``.  ``axes=None`` or ``'auto'`` uses all devices on a
    single ``dp`` axis."""
    if devices is None:
        devices = jax.devices()
    if not axes or axes == 'auto':
        axes = {'dp': len(devices)}
    sizes = list(axes.values())
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f'Mesh {axes} needs {total} devices, '
                         f'have {len(devices)}')
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, tuple(axes.keys()))


def batch_spec(mesh: Mesh) -> P:
    """Rows over 'dp' when present, else replicated."""
    return P('dp') if 'dp' in mesh.axis_names else P()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec(mesh))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def member_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (stacked-member) axis over 'member' when present."""
    if 'member' in mesh.axis_names:
        return NamedSharding(mesh, P('member'))
    return replicated(mesh)


def param_spec(leaf, mesh: Mesh, member_stacked: bool = False) -> P:
    """PartitionSpec for one parameter/state leaf:

    - the stacked-member leading axis shards over ``member`` (ensembles),
    - the last (output-feature) axis of ≥2-D leaves shards over ``tp``
      (hidden-dimension tensor parallel) when the mesh has a ``tp`` axis
      and the feature dim divides evenly — XLA's SPMD partitioner then
      splits every GEMM column-wise and inserts the ICI collectives,
    - everything else is replicated.
    """
    if leaf.ndim == 0:
        return P()
    spec = [None] * leaf.ndim
    if member_stacked and 'member' in mesh.axis_names:
        spec[0] = 'member'
    feat_dims = leaf.ndim - (1 if member_stacked else 0)
    if 'tp' in mesh.axis_names and feat_dims >= 1 and leaf.ndim >= 2 \
            and leaf.shape[-1] % mesh.shape['tp'] == 0:
        spec[-1] = 'tp'
    return P(*spec)


def shard_params(params, mesh: Mesh, member_stacked: bool = False):
    """Place a parameter pytree on the mesh: leading-axis sharded over
    'member' for stacked ensembles, last-feature-axis sharded over 'tp'
    when the mesh has one, replicated otherwise (see :func:`param_spec`)."""
    return jax.tree_util.tree_map(
        lambda l: jax.device_put(
            l, NamedSharding(mesh, param_spec(l, mesh, member_stacked))),
        params)


def constrain_batch(x, mesh: Mesh):
    """Inside-jit constraint pinning batch rows to the dp axis."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, batch_spec(mesh)))


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad rows so the dp axis divides evenly; returns (padded, n_valid)."""
    n = x.shape[axis]
    rem = n % multiple
    if rem == 0:
        return x, n
    pad = multiple - rem
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    import jax.numpy as jnp
    return jnp.pad(x, widths, mode='edge'), n
