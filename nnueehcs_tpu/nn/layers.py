"""Functional layer registry — the TPU-native replacement for the reference's
``torch.nn``-backed declarative network builder (reference:
``nnueehcs/model_builder.py:10-73``).

Every layer is a *static configuration object* with two pure functions:

- ``init(key, in_shape) -> (params, state, out_shape)``
- ``apply(params, state, x, mode) -> (y, new_state)``

``params`` / ``state`` are pytrees of ``jnp`` arrays, so whole networks
compose under ``jax.jit`` / ``jax.vmap`` / ``jax.grad``.  A stacked leading
axis on the pytrees turns a single network into an ensemble (or a set of MC
samples) with **zero** code changes — this is the design that maps the
reference's ``torch.func.stack_module_state`` + ``torch.vmap`` trick
(reference ``nnueehcs/models.py:94-101``) onto the TPU's MXU.

Weight initialisation follows torch defaults (Kaiming-uniform with
``a=sqrt(5)`` for Linear/Conv, i.e. ``U(±1/sqrt(fan_in))``) so converged
behaviour matches the reference's golden training tests.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Mode:
    """Per-call behaviour flags threaded through ``apply``.

    ``batch_stats``:  if True, BatchNorm normalises with batch statistics and
        updates running stats (training behaviour).  If False it uses the
        stored running statistics (eval behaviour).
    ``dropout``:  if True, Dropout layers are active.  This is decoupled from
        ``batch_stats`` because MC-dropout evaluation keeps dropout *on* while
        BatchNorm stays in eval mode (reference ``nnueehcs/models.py:165-169``).
    """
    batch_stats: bool = False
    dropout: bool = False


TRAIN_MODE = Mode(batch_stats=True, dropout=True)
EVAL_MODE = Mode(batch_stats=False, dropout=False)
MC_EVAL_MODE = Mode(batch_stats=False, dropout=True)


def _kaiming_uniform_bound(fan_in: int) -> float:
    # torch.nn.Linear / Conv2d default: kaiming_uniform(a=sqrt(5)) which
    # reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    return 1.0 / float(np.sqrt(fan_in)) if fan_in > 0 else 0.0


class Layer:
    """Base class: a stateless, parameterless layer."""

    def init(self, key, in_shape):
        return {}, {}, in_shape

    def apply(self, params, state, x, mode: Mode, rng=None):
        raise NotImplementedError

    # Number of independent PRNG streams this layer consumes per apply.
    rng_streams = 0


@dataclasses.dataclass(frozen=True)
class Linear(Layer):
    in_features: int
    out_features: int
    bias: bool = True

    def init(self, key, in_shape):
        wkey, bkey = jax.random.split(key)
        bound = _kaiming_uniform_bound(self.in_features)
        w = jax.random.uniform(
            wkey, (self.in_features, self.out_features),
            minval=-bound, maxval=bound, dtype=jnp.float32)
        params = {'w': w}
        if self.bias:
            params['b'] = jax.random.uniform(
                bkey, (self.out_features,), minval=-bound, maxval=bound,
                dtype=jnp.float32)
        return params, {}, in_shape[:-1] + (self.out_features,)

    def apply(self, params, state, x, mode: Mode, rng=None):
        # accumulate in f32 regardless of operand dtype (canonical TPU
        # pattern: bf16 operands on the MXU, f32 accumulation).  Master
        # weights stay f32; under a bf16 compute dtype the cast below puts
        # both GEMM operands in bf16 so the MXU runs its fast path.
        w = params['w']
        if w.dtype != x.dtype:
            w = w.astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        if self.bias:
            y = y + params['b'].astype(jnp.float32)
        return y.astype(x.dtype), state


@dataclasses.dataclass(frozen=True)
class Conv2d(Layer):
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    bias: bool = True

    def init(self, key, in_shape):
        wkey, bkey = jax.random.split(key)
        k = self.kernel_size
        fan_in = self.in_channels * k * k
        bound = _kaiming_uniform_bound(fan_in)
        w = jax.random.uniform(
            wkey, (self.out_channels, self.in_channels, k, k),
            minval=-bound, maxval=bound, dtype=jnp.float32)
        params = {'w': w}
        if self.bias:
            params['b'] = jax.random.uniform(
                bkey, (self.out_channels,), minval=-bound, maxval=bound,
                dtype=jnp.float32)
        # NCHW in/out shape bookkeeping
        if len(in_shape) >= 3:
            h, wd = in_shape[-2], in_shape[-1]
            oh = (h + 2 * self.padding - k) // self.stride + 1
            ow = (wd + 2 * self.padding - k) // self.stride + 1
            out_shape = in_shape[:-3] + (self.out_channels, oh, ow)
        else:
            out_shape = in_shape
        return params, {}, out_shape

    def apply(self, params, state, x, mode: Mode, rng=None):
        w = params['w']
        if w.dtype != x.dtype:
            w = w.astype(x.dtype)   # bf16 conv operands, f32 accumulation
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
            preferred_element_type=jnp.float32)
        if self.bias:
            y = y + params['b'][None, :, None, None]
        return y.astype(x.dtype), state


@dataclasses.dataclass(frozen=True)
class BatchNorm1d(Layer):
    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True

    def init(self, key, in_shape):
        params = {}
        if self.affine:
            params = {'scale': jnp.ones((self.num_features,), jnp.float32),
                      'bias': jnp.zeros((self.num_features,), jnp.float32)}
        state = {'mean': jnp.zeros((self.num_features,), jnp.float32),
                 'var': jnp.ones((self.num_features,), jnp.float32)}
        return params, state, in_shape

    def apply(self, params, state, x, mode: Mode, rng=None):
        if mode.batch_stats:
            axes = tuple(i for i in range(x.ndim) if i != x.ndim - 1)
            xf = x.astype(jnp.float32)
            batch_mean = jnp.mean(xf, axis=axes)
            batch_var = jnp.var(xf, axis=axes)
            n = x.size // x.shape[-1]
            # torch tracks the *unbiased* variance in running stats while
            # normalising with the biased one.
            unbiased = batch_var * (n / max(n - 1, 1))
            m = self.momentum
            new_state = {
                'mean': (1 - m) * state['mean'] + m * batch_mean,
                'var': (1 - m) * state['var'] + m * unbiased,
            }
            mean, var = batch_mean, batch_var
        else:
            new_state = state
            mean, var = state['mean'], state['var']
        inv = jax.lax.rsqrt(var + self.eps)
        # stats/affine are f32; the elementwise normalise chain over the
        # (…, B, C) activations runs in the input dtype so bf16 mode keeps
        # the VPU on its fast path instead of materialising f32 copies
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
        if self.affine:
            y = y * params['scale'].astype(x.dtype) \
                + params['bias'].astype(x.dtype)
        return y.astype(x.dtype), new_state


@dataclasses.dataclass(frozen=True)
class BatchNorm2d(Layer):
    """Per-channel batch norm over NCHW feature maps (torch semantics)."""
    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True

    def init(self, key, in_shape):
        params = {}
        if self.affine:
            params = {'scale': jnp.ones((self.num_features,), jnp.float32),
                      'bias': jnp.zeros((self.num_features,), jnp.float32)}
        state = {'mean': jnp.zeros((self.num_features,), jnp.float32),
                 'var': jnp.ones((self.num_features,), jnp.float32)}
        return params, state, in_shape

    def apply(self, params, state, x, mode: Mode, rng=None):
        # channel axis is -3 in NCHW (works for stacked leading axes too)
        axes = tuple(i for i in range(x.ndim) if i != x.ndim - 3)
        if mode.batch_stats:
            xf = x.astype(jnp.float32)   # f32 statistics under bf16 compute
            batch_mean = jnp.mean(xf, axis=axes)
            batch_var = jnp.var(xf, axis=axes)
            n = x.size // x.shape[-3]
            unbiased = batch_var * (n / max(n - 1, 1))
            m = self.momentum
            new_state = {
                'mean': (1 - m) * state['mean'] + m * batch_mean,
                'var': (1 - m) * state['var'] + m * unbiased,
            }
            mean, var = batch_mean, batch_var
        else:
            new_state = state
            mean, var = state['mean'], state['var']
        shape = (-1,) + (1,) * 2
        inv = jax.lax.rsqrt(var.reshape(shape) + self.eps)
        y = (x - mean.reshape(shape).astype(x.dtype)) * \
            inv.astype(x.dtype)
        if self.affine:
            y = y * params['scale'].reshape(shape).astype(x.dtype) \
                + params['bias'].reshape(shape).astype(x.dtype)
        return y.astype(x.dtype), new_state


@dataclasses.dataclass(frozen=True)
class Dropout(Layer):
    p: float = 0.5
    rng_streams = 1

    def apply(self, params, state, x, mode: Mode, rng=None):
        if not mode.dropout or self.p <= 0.0 or rng is None:
            return x, state
        keep = 1.0 - self.p
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype), state


class _Activation(Layer):
    fn = staticmethod(lambda x: x)

    def apply(self, params, state, x, mode: Mode, rng=None):
        return self.fn(x), state


@dataclasses.dataclass(frozen=True)
class ReLU(_Activation):
    inplace: bool = False   # accepted for YAML-schema parity, ignored
    fn = staticmethod(jax.nn.relu)


@dataclasses.dataclass(frozen=True)
class Tanh(_Activation):
    fn = staticmethod(jnp.tanh)


@dataclasses.dataclass(frozen=True)
class Sigmoid(_Activation):
    fn = staticmethod(jax.nn.sigmoid)


@dataclasses.dataclass(frozen=True)
class GELU(_Activation):
    approximate: str = 'none'

    def apply(self, params, state, x, mode: Mode, rng=None):
        return jax.nn.gelu(x, approximate=self.approximate != 'none'), state


@dataclasses.dataclass(frozen=True)
class SiLU(_Activation):
    inplace: bool = False
    fn = staticmethod(jax.nn.silu)


@dataclasses.dataclass(frozen=True)
class ELU(_Activation):
    alpha: float = 1.0
    inplace: bool = False

    def apply(self, params, state, x, mode: Mode, rng=None):
        return jax.nn.elu(x, alpha=self.alpha), state


@dataclasses.dataclass(frozen=True)
class LeakyReLU(_Activation):
    negative_slope: float = 0.01
    inplace: bool = False

    def apply(self, params, state, x, mode: Mode, rng=None):
        return jax.nn.leaky_relu(x, negative_slope=self.negative_slope), state


@dataclasses.dataclass(frozen=True)
class Softplus(_Activation):
    beta: float = 1.0
    threshold: float = 20.0

    def apply(self, params, state, x, mode: Mode, rng=None):
        xb = x * self.beta
        y = jnp.where(xb > self.threshold, x, jax.nn.softplus(xb) / self.beta)
        return y, state


@dataclasses.dataclass(frozen=True)
class Identity(_Activation):
    fn = staticmethod(lambda x: x)


@dataclasses.dataclass(frozen=True)
class Flatten(Layer):
    start_dim: int = 1
    end_dim: int = -1

    def init(self, key, in_shape):
        flat = int(np.prod(in_shape[self.start_dim:])) if in_shape else 0
        return {}, {}, in_shape[:self.start_dim] + (flat,)

    def apply(self, params, state, x, mode: Mode, rng=None):
        end = self.end_dim if self.end_dim >= 0 else x.ndim + self.end_dim
        new_shape = x.shape[:self.start_dim] + (-1,) + x.shape[end + 1:]
        return x.reshape(new_shape), state


@dataclasses.dataclass(frozen=True)
class MaxPool2d(Layer):
    kernel_size: int
    stride: Optional[int] = None
    padding: int = 0

    def apply(self, params, state, x, mode: Mode, rng=None):
        k = self.kernel_size
        s = self.stride if self.stride is not None else k
        y = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 1, k, k),
            window_strides=(1, 1, s, s),
            padding=[(0, 0), (0, 0)] + [(self.padding, self.padding)] * 2)
        return y, state


@dataclasses.dataclass(frozen=True)
class AvgPool2d(Layer):
    kernel_size: int
    stride: Optional[int] = None
    padding: int = 0

    def apply(self, params, state, x, mode: Mode, rng=None):
        k = self.kernel_size
        s = self.stride if self.stride is not None else k
        summed = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            window_dimensions=(1, 1, k, k),
            window_strides=(1, 1, s, s),
            padding=[(0, 0), (0, 0)] + [(self.padding, self.padding)] * 2)
        return summed / (k * k), state


@dataclasses.dataclass(frozen=True)
class LayerNorm(Layer):
    normalized_shape: Any
    eps: float = 1e-5

    def init(self, key, in_shape):
        shape = (self.normalized_shape,) if isinstance(
            self.normalized_shape, int) else tuple(self.normalized_shape)
        params = {'scale': jnp.ones(shape, jnp.float32),
                  'bias': jnp.zeros(shape, jnp.float32)}
        return params, {}, in_shape

    def apply(self, params, state, x, mode: Mode, rng=None):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * params['scale'] + params['bias'], state


# Registry used by the YAML network builder.  Names intentionally match
# ``torch.nn`` class names so the reference's YAML configs load unchanged
# (reference ``examples/bo_driven/config.yaml:113-376``).
LAYER_REGISTRY = {
    'Linear': Linear,
    'Conv2d': Conv2d,
    'BatchNorm1d': BatchNorm1d,
    'BatchNorm2d': BatchNorm2d,
    'Dropout': Dropout,
    'ReLU': ReLU,
    'Tanh': Tanh,
    'Sigmoid': Sigmoid,
    'GELU': GELU,
    'SiLU': SiLU,
    'ELU': ELU,
    'LeakyReLU': LeakyReLU,
    'Softplus': Softplus,
    'Identity': Identity,
    'Flatten': Flatten,
    'MaxPool2d': MaxPool2d,
    'AvgPool2d': AvgPool2d,
    'LayerNorm': LayerNorm,
}


def register_layer(name: str, cls) -> None:
    """Extension hook mirroring the reference's multi-namespace LayerBuilder."""
    LAYER_REGISTRY[name] = cls
