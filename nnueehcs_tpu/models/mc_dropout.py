"""Monte-Carlo dropout via vmapped PRNG keys.

TPU-native redesign of the reference MC-dropout wrapper (reference
``nnueehcs/models.py:124-179``).  The reference forces dropout modules back
into train mode during ``eval()`` and vmaps stacked copies of the model with
``randomness='different'``; here dropout is an explicit
``jax.random.bernoulli`` mask, so MC sampling is simply a ``vmap`` over
``num_samples`` split keys with batch-norm kept in eval mode — one compiled
program, no module-mode mutation.

Training uses a single stochastic pass (reference ``models.py:148-149``);
evaluation averages ``num_samples`` stochastic passes and reports the
unbiased std as the uncertainty estimate.
"""
from __future__ import annotations

import dataclasses

import jax

from ..nn.layers import MC_EVAL_MODE, Dropout
from ..nn.network import Network
from .base import WrappedModelBase, _std_unbiased


class MCDropoutModel(WrappedModelBase):
    uq_method = 'mc_dropout'

    def __init__(self, net, num_samples: int = 100, dropout_percent: float = 0.5,
                 vectorize: bool = True, **kwargs):
        # Override p on every Dropout layer, mirroring the reference's
        # post-hoc module walk (reference ``models.py:132-134``).
        layers = tuple(
            dataclasses.replace(l, p=dropout_percent) if isinstance(l, Dropout) else l
            for l in net.layers)
        net = Network(layers, architecture=net.architecture)
        super().__init__(net, **kwargs)
        self.num_samples = num_samples
        self.dropout_percent = dropout_percent
        self.vectorize = vectorize
        # MC eval draws O(samples × batch × width) random bits per layer;
        # the default threefry generator can dominate the pass. Set
        # NNUEEHCS_TPU_PRNG_IMPL=rbg (or unsafe_rbg) for a hardware-friendly
        # counter generator on the sampling path only.
        import os
        impl = os.environ.get('NNUEEHCS_TPU_PRNG_IMPL')
        self._sample_key = jax.random.PRNGKey(0) if not impl \
            else jax.random.key(0, impl=impl)

    def _eval_rng(self):
        return self._sample_key

    def eval_output(self, params, state, x, rng, return_ue: bool = False):
        keys = jax.random.split(rng, self.num_samples)

        def single(key):
            y, _ = self.net.apply(params, state, x, MC_EVAL_MODE, rng=key)
            return y
        preds = jax.vmap(single)(keys)          # (S, B, out)
        mean = preds.mean(0)
        if return_ue:
            return mean, _std_unbiased(preds, axis=0)
        return mean

    def config_dict(self):
        d = super().config_dict()
        d['num_samples'] = self.num_samples
        d['dropout_percent'] = self.dropout_percent
        return d
