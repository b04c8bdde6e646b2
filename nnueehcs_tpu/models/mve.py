"""Mean-variance estimation (heteroscedastic Gaussian head).

An addition beyond the reference's six methods: the classic single-model
aleatoric-uncertainty baseline from Lakshminarayanan et al., "Simple and
Scalable Predictive Uncertainty Estimation using Deep Ensembles" (the
non-ensembled NLL-trained component; see PAPERS.md).  The network's last
layer emits ``(mu, raw_sigma)``; training minimises the Gaussian negative
log-likelihood with ``sigma² = softplus(raw) + eps``; the uncertainty
estimate is the predicted ``sigma``.

Follows the same wrapper contract as every other method:
``model(x, return_ue=True) -> (mu, sigma)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.layers import TRAIN_MODE, EVAL_MODE
from .base import WrappedModelBase

_VAR_EPS = 1e-6


def gaussian_nll(out, y):
    """out[..., 0:1] = mu, out[..., 1:2] = raw variance parameter."""
    mu = out[..., 0:1]
    var = jax.nn.softplus(out[..., 1:2]) + _VAR_EPS
    return jnp.mean(0.5 * jnp.log(var) + 0.5 * jnp.square(y - mu) / var)


class MVEMLPModel(WrappedModelBase):
    uq_method = 'mve'

    def __init__(self, net, min_variance: float = _VAR_EPS, **kwargs):
        super().__init__(net, **kwargs)
        self.min_variance = min_variance

    def training_loss(self, params, state, batch, rng):
        x, y = batch
        out, new_state = self.net.apply(params, state, x, TRAIN_MODE, rng=rng)
        return gaussian_nll(out, y), new_state

    def validation_loss(self, params, state, batch, rng):
        x, y = batch
        out, _ = self.net.apply(params, state, x, EVAL_MODE, rng=None)
        return gaussian_nll(out, y)

    def eval_output(self, params, state, x, rng, return_ue: bool = False):
        out, _ = self.net.apply(params, state, x, EVAL_MODE, rng=None)
        mu = out[..., 0:1]
        if not return_ue:
            return mu
        sigma = jnp.sqrt(jax.nn.softplus(out[..., 1:2]) + self.min_variance)
        return mu, sigma

    def config_dict(self):
        d = super().config_dict()
        d['min_variance'] = self.min_variance
        return d
