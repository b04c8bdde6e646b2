"""Loss registry keyed by ``torch.nn.functional`` names.

The reference looks losses up by name in ``torch.nn.functional`` (reference
``nnueehcs/models.py:52-56``); here the same names resolve to pure jnp
functions with identical reduction semantics (mean over all elements).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def smooth_l1_loss(pred, target, beta: float = 1.0):
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def huber_loss(pred, target, delta: float = 1.0):
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d <= delta, 0.5 * d * d, delta * (d - 0.5 * delta)))


def binary_cross_entropy(pred, target):
    # clamp the log terms (torch clamps at -100): clipping the probability
    # by 1e-12 is a no-op in float32 near 1.0 and would yield inf loss
    logp = jnp.clip(jnp.log(pred), -100.0, 0.0)
    log1mp = jnp.clip(jnp.log1p(-pred), -100.0, 0.0)
    return -jnp.mean(target * logp + (1 - target) * log1mp)


def binary_cross_entropy_with_logits(logits, target):
    return jnp.mean(jnp.maximum(logits, 0) - logits * target
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def cross_entropy(logits, target):
    logp = jax.nn.log_softmax(logits, axis=-1)
    if target.ndim == logits.ndim:           # soft labels
        return -jnp.mean(jnp.sum(target * logp, axis=-1))
    return -jnp.mean(jnp.take_along_axis(
        logp, target[..., None].astype(jnp.int32), axis=-1))


LOSS_REGISTRY = {
    'l1_loss': l1_loss,
    'mse_loss': mse_loss,
    'smooth_l1_loss': smooth_l1_loss,
    'huber_loss': huber_loss,
    'binary_cross_entropy': binary_cross_entropy,
    'binary_cross_entropy_with_logits': binary_cross_entropy_with_logits,
    'cross_entropy': cross_entropy,
}


def get_loss_fn(name: str):
    try:
        return LOSS_REGISTRY[name]
    except KeyError:
        raise ValueError(f'Unknown loss function: {name}')
