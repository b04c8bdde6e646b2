"""Mesh sharding: dp batch sharding, member-parallel ensembles, and
hidden-dimension tensor parallelism (tp)."""
from .mesh import (make_mesh, batch_spec, batch_sharding, replicated,
                   member_sharding, param_spec, shard_params,
                   constrain_batch, pad_to_multiple)

__all__ = ['make_mesh', 'batch_spec', 'batch_sharding', 'replicated',
           'member_sharding', 'param_spec', 'shard_params',
           'constrain_batch', 'pad_to_multiple']
