"""Deep ensemble with a stacked-parameter member axis.

TPU-native redesign of the reference's ensemble (reference
``nnueehcs/models.py:88-121``): instead of N ``nn.Module`` copies optionally
stacked with ``torch.func.stack_module_state``, members live permanently as a
leading axis on the parameter pytree.  One ``vmap`` turns every member
forward into a single batched program; all members train simultaneously in
one jitted step, and member matmuls fuse into large MXU-friendly batched
GEMMs.

Loss semantics: the reference trains all members through the loss of the
*mean* prediction (single shared loss signal; members differ only by init
seed — reference ``models.py:99-108``, ``model_builder.py:227-231``).  That
behaviour is the default (``ensemble_loss: joint_mean``) for parity; the
idiomatic per-member independent loss is available via
``ensemble_loss: per_member`` in the train config.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.layers import TRAIN_MODE, EVAL_MODE
from .base import WrappedModelBase, _std_unbiased


class EnsembleModel(WrappedModelBase):
    uq_method = 'ensemble'
    member_stacked = True

    def __init__(self, net, num_models: int, vectorize: bool = True, **kwargs):
        super().__init__(net, **kwargs)
        self.num_models = num_models
        self.vectorize = vectorize  # kept for API parity; always vectorized

    def init(self, key, in_shape):
        keys = jax.random.split(key, self.num_models)
        shape = (1,) + tuple(in_shape)
        self.params, self.state = jax.vmap(
            lambda k: self.net.init(k, shape))(keys)
        self.invalidate_cache()
        return self.params, self.state

    def _member_apply(self, mode):
        def single(p, s, x, rng):
            return self.net.apply(p, s, x, mode, rng=rng)
        return jax.vmap(single, in_axes=(0, 0, None, None))

    def train_output(self, params, state, x, rng):
        outputs, new_state = self._member_apply(TRAIN_MODE)(params, state, x, rng)
        if self.train_config.get('ensemble_loss', 'joint_mean') == 'per_member':
            return outputs, new_state          # (N, B, out)
        return outputs.mean(0), new_state

    def train_targets(self, y):
        if self.train_config.get('ensemble_loss', 'joint_mean') == 'per_member':
            return jnp.broadcast_to(y, (self.num_models,) + y.shape)
        return y

    def eval_output(self, params, state, x, rng, return_ue: bool = False):
        outputs, _ = self._member_apply(EVAL_MODE)(params, state, x, None)
        mean = outputs.mean(0)
        if return_ue:
            return mean, _std_unbiased(outputs, axis=0)
        return mean

    def config_dict(self):
        d = super().config_dict()
        d['num_models'] = self.num_models
        return d
