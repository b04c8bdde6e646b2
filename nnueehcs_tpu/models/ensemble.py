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
        if getattr(self, '_fused_active', False):
            # fused fast path: BatchNorm pre-folded into the Linear weights
            # (cached per parameter version; see __call__), all member
            # weights resident in VMEM, mean/std computed on-chip
            from ..ops.fused_ensemble import fused_forward_prefolded
            mean, std = fused_forward_prefolded(self._fused_cache, x)
            mean = mean.astype(x.dtype)
            if return_ue:
                return mean, std.astype(x.dtype)
            return mean
        outputs, _ = self._member_apply(EVAL_MODE)(params, state, x, None)
        mean = outputs.mean(0)
        if return_ue:
            return mean, _std_unbiased(outputs, axis=0)
        return mean

    def invalidate_cache(self):
        super().invalidate_cache()
        self._fused_cache = None

    def __call__(self, x, return_ue: bool = False):
        """Stateful eval: routes through the fused VMEM-resident kernel when
        the architecture allows.  Folded weights bake the current params AND
        batch-norm state into the compiled program, so the cache (and the
        jit cache whose traces embed it) is rebuilt whenever either pytree
        object is replaced (training updates swap both wholesale).  The
        staleness check runs regardless of whether fusion is enabled, so
        toggling NNUEEHCS_TPU_NO_FUSED never replays stale traces (the jit
        cache key also encodes the fused flag)."""
        self._fused_active = False
        if self.initialized:
            cache = getattr(self, '_fused_cache', None)
            if cache is not None and cache.stale_for(self.params, self.state):
                # traces exist that embed the old folded weights — drop them
                self.invalidate_cache()   # also clears _fused_cache
                cache = None
            if cache is None and self._use_fused_eval():
                from ..ops.fused_ensemble import prepare_fused_weights
                cache = prepare_fused_weights(self.net, self.params,
                                              self.state)
                self._fused_cache = cache
            self._fused_active = (cache is not None and cache.folded
                                  and self._use_fused_eval())
        try:
            return super().__call__(x, return_ue=return_ue)
        finally:
            self._fused_active = False

    def config_dict(self):
        d = super().config_dict()
        d['num_models'] = self.num_models
        return d
