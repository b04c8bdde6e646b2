"""Model wrapper base: the uniform ``model(x, return_ue=False)`` contract.

TPU-native re-design of the reference's Lightning-module base (reference
``nnueehcs/models.py:22-85``).  Instead of an object with mutable forward
behaviour, every wrapper exposes *pure* functions over explicit
``(params, state)`` pytrees:

- ``training_loss(params, state, batch, rng) -> (loss, new_state)`` — the
  function the trainer differentiates (one jitted program per trial),
- ``validation_loss(params, state, batch, rng) -> loss``,
- ``eval_output(params, state, x, rng, return_ue)`` — the UE forward pass.

The stateful convenience API (``model(x, return_ue=True)``) wraps these pure
functions with a jit cache bucketed by padded batch size, so arbitrary-length
evaluation batches hit a handful of compiled programs with static shapes.

Training defaults mirror the reference exactly: ``lr 1e-3, batch 32,
epochs 10, loss l1_loss`` (reference ``nnueehcs/models.py:13-19``).
"""
from __future__ import annotations

import copy
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import TRAIN_MODE, EVAL_MODE, Mode
from ..nn.network import Network
from ..ops.losses import get_loss_fn

training_defaults = {
    'learning_rate': 1e-3,
    'batch_size': 32,
    'num_workers': 1,
    'num_epochs': 10,
    'loss': 'l1_loss',
}

# Eval batches are padded up to the next bucket so any input length maps to a
# few compiled programs. Row-independent forward passes make padding safe.
# Batches beyond _MAX_BUCKET are chunked: the member×batch×width
# intermediates of the UQ fan-outs must fit HBM (8 members × 2^19 rows ×
# 128 wide ≈ 2 GB of f32 activations per layer).
_MIN_BUCKET = 256
_MAX_BUCKET = 1 << 19


def _bucket_size(n: int) -> int:
    b = _MIN_BUCKET
    while b < n and b < _MAX_BUCKET:
        b *= 2
    return b


def _std_unbiased(x, axis=0):
    """torch.Tensor.std default is the *unbiased* (ddof=1) estimator.
    Computed in f32 so bf16 compute modes keep accurate UE statistics."""
    return jnp.std(x.astype(jnp.float32), axis=axis, ddof=1)


class WrappedModelBase:
    """Base for all UQ model wrappers."""

    uq_method = 'mlp'
    # True when params carry a leading stacked-member axis (ensembles) that
    # should shard over a 'member' mesh axis.
    member_stacked = False

    def __init__(self, net: Network, train_config=None, validation_config=None):
        self.net = net
        self.train_config = copy.deepcopy(training_defaults)
        self.validation_config = copy.deepcopy(training_defaults)
        self.set_train_config(train_config)
        self.set_validation_config(validation_config)

        self.params = None
        self.state = None
        self.dtype = jnp.float32
        self._jit_cache = {}
        self._cache_version = 0
        self._mesh = None

    # ------------------------------------------------------------------ config
    def set_train_config(self, train_config):
        if train_config is None:
            self.set_train_config(self.train_config)
            return
        self.train_config.update(train_config)
        self.loss = self.get_loss_fn(self.train_config['loss'])
        if 'precision' in self.train_config:
            self.set_precision(self.train_config['precision'])

    # Lightning-style precision strings → compute dtype.  fp16 is not a TPU
    # dtype; asking for it is an error, not a silent downgrade.
    _PRECISIONS = {None: None, '32': None, '32-true': None, 32: None,
                   'bf16': jnp.bfloat16, 'bf16-mixed': jnp.bfloat16,
                   'bf16-true': jnp.bfloat16}

    def set_precision(self, precision):
        """Set the compute precision: activations and GEMM operands run in
        the compute dtype (bf16 on the MXU fast path) while parameters stay
        f32 master weights and every matmul accumulates in f32.  Outputs are
        returned in the input dtype, so UE statistics and losses stay f32."""
        if precision not in self._PRECISIONS:
            raise ValueError(
                f'Unsupported precision {precision!r}; TPU options: '
                f"'32-true' (default) or 'bf16-mixed'")
        self.precision = precision
        self.net.compute_dtype = self._PRECISIONS[precision]
        self.invalidate_cache()
        return self

    def set_validation_config(self, validation_config):
        if validation_config is None:
            self.set_validation_config(self.train_config)
            return
        self.validation_config.update(validation_config)
        self.val_loss = self.get_loss_fn(self.validation_config['loss'])

    def get_loss_fn(self, name):
        return get_loss_fn(name)

    def get_callbacks(self):
        return []

    # ------------------------------------------------------------------ init
    def init(self, key, in_shape):
        """Initialise parameters for input feature shape ``in_shape``
        (without the batch axis)."""
        self.params, self.state = self.net.init(key, (1,) + tuple(in_shape))
        self.invalidate_cache()
        return self.params, self.state

    @property
    def initialized(self):
        return self.params is not None

    def invalidate_cache(self):
        self._jit_cache = {}
        self._cache_version = getattr(self, '_cache_version', 0) + 1

    # ------------------------------------------------------ pure training fns
    def train_output(self, params, state, x, rng):
        return self.net.apply(params, state, x, TRAIN_MODE, rng=rng)

    def train_targets(self, y):
        return y

    def training_loss(self, params, state, batch, rng):
        x, y = batch
        out, new_state = self.train_output(params, state, x, rng)
        return self.loss(out, self.train_targets(y)), new_state

    def validation_loss(self, params, state, batch, rng):
        # note: the reference's validation_step computes the *training*
        # loss on validation batches (``self.loss``, reference
        # ``models.py:65-70``); ``val_loss`` exists but is unused there.
        x, y = batch
        out = self.eval_output(params, state, x, rng, return_ue=False)
        return self.loss(out, y)

    # ------------------------------------------------------------- pure eval
    def eval_output(self, params, state, x, rng, return_ue: bool = False):
        y, _ = self.net.apply(params, state, x, EVAL_MODE, rng=None)
        if return_ue:
            raise NotImplementedError(
                f'{type(self).__name__} does not define an uncertainty estimate')
        return y

    # ---------------------------------------------------------- eval buffers
    def eval_buffers(self):
        """Pytree of non-parameter device buffers the UE pass reads (fit
        corpora, anchor sets).  They are threaded through the jit cache as
        program *arguments* — a closure-captured array would be baked into
        the compiled program as an HLO constant, bloating every compile
        (multi-GB for large density corpora) and hiding the buffer from
        the per-pass memory analysis."""
        return ()

    def eval_with_buffers(self, params, state, buffers, x, rng,
                          return_ue: bool = False):
        """Like :meth:`eval_output` but with :meth:`eval_buffers` passed as
        traced arguments.  The default ignores ``buffers``; density/anchor
        models override this and keep ``eval_output`` as the
        closure-capturing convenience wrapper."""
        return self.eval_output(params, state, x, rng, return_ue=return_ue)

    # ------------------------------------------------------------- sharding
    def attach_mesh(self, mesh):
        """Place this model on a device mesh: params replicated (or
        member-sharded for stacked ensembles) and evaluation batches
        row-sharded over the 'dp' axis."""
        from ..parallel.mesh import shard_params
        self._mesh = mesh
        if self.params is not None:
            self.params = shard_params(self.params, mesh, self.member_stacked)
            self.state = shard_params(self.state, mesh, self.member_stacked)
        self.invalidate_cache()
        return self

    def _place_eval_batch(self, x):
        if self._mesh is None:
            return x
        from ..parallel.mesh import batch_sharding
        return jax.device_put(x, batch_sharding(self._mesh))

    # --------------------------------------------------------- stateful sugar
    def _use_fused_eval(self) -> bool:
        """Whether fused Pallas eval kernels may engage (TPU, unsharded,
        not opted out)."""
        import os
        if os.environ.get('NNUEEHCS_TPU_NO_FUSED'):
            return False
        return jax.default_backend() == 'tpu' and self._mesh is None

    def _eval_rng(self):
        return None

    def _peek_eval_rng(self):
        """The rng the *next* eval call would use, without consuming the
        stream (for AOT lowering / memory analysis)."""
        return None

    def __call__(self, x, return_ue: bool = False):
        if not self.initialized:
            raise RuntimeError('Model parameters are not initialised; '
                               'call model.init(key, in_shape) or train first.')
        x = jnp.asarray(x)
        if x.dtype == jnp.float64:
            x = x.astype(self.dtype)
        squeeze_batch = False
        if x.ndim == 1:
            x = x[None]
            squeeze_batch = True
        n = x.shape[0]
        if n > _MAX_BUCKET:
            outputs = [self.__call__(x[i:i + _MAX_BUCKET],
                                     return_ue=return_ue)
                       for i in range(0, n, _MAX_BUCKET)]
            if isinstance(outputs[0], tuple):
                return tuple(jnp.concatenate([o[i] for o in outputs], axis=0)
                             for i in range(len(outputs[0])))
            return jnp.concatenate(outputs, axis=0)
        bucket = _bucket_size(n)
        if self._mesh is not None and 'dp' in self._mesh.axis_names:
            # the padded batch must divide evenly over the dp axis
            dp = self._mesh.shape['dp']
            bucket = -(-bucket // dp) * dp
        key = ('eval', return_ue, bucket,
               getattr(self, '_fused_active', False),
               # the fused GEMM issue order is read from the environment at
               # trace time (ops/fused_ensemble.fused_forward_prefolded);
               # keying the trace on it makes mid-process toggles of
               # NNUEEHCS_TPU_FUSED_ORDER take effect instead of silently
               # reusing the previously traced order
               os.environ.get('NNUEEHCS_TPU_FUSED_ORDER', 'member')
               if getattr(self, '_fused_active', False) else None,
               ) + x.shape[1:]
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(
                lambda p, s, b, xx, r: self.eval_with_buffers(
                    p, s, b, xx, r, return_ue=return_ue))
            self._jit_cache[key] = fn
        if bucket != n:
            pad = jnp.zeros((bucket - n,) + x.shape[1:], x.dtype)
            # pad with the first row repeated to keep values in-distribution
            pad = pad + x[0]
            x_padded = jnp.concatenate([x, pad], axis=0)
        else:
            x_padded = x
        x_padded = self._place_eval_batch(x_padded)
        out = fn(self.params, self.state, self.eval_buffers(), x_padded,
                 self._eval_rng())

        def trim(o):
            if o.shape[0] == 2 * bucket:
                # doubled-batch forward (ΔUQ's anchor-less fallback,
                # reference ``models.py:319-322``): keep both halves
                o = jnp.concatenate([o[:n], o[bucket:bucket + n]], axis=0)
            else:
                o = o[:n]
            return o[0] if squeeze_batch else o
        if isinstance(out, tuple):
            return tuple(trim(o) for o in out)
        return trim(out)

    # ------------------------------------------------------------- memory
    def eval_pass_memory_mb(self, x, return_ue: bool = True):
        """Per-pass device-memory footprint (MB) of the compiled UE-eval
        program at this batch shape: arguments (params + input) + XLA temp
        buffers + outputs from the executable's buffer assignment.

        The TPU-native equivalent of the reference's CUDA
        ``reset_peak_memory_stats`` / ``max_memory_allocated`` delta
        (reference ``nnueehcs/evaluation.py:383-412``): XLA plans a static
        buffer assignment per program at compile time, so the analysis *is*
        the per-pass peak — independent of process history, unlike the
        device's lifetime ``peak_bytes_in_use`` counter.  Returns ``None``
        when the backend exposes no memory analysis.
        """
        if not self.initialized:
            raise RuntimeError('Model parameters are not initialised')
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[None]
        n = min(x.shape[0], _MAX_BUCKET)
        bucket = _bucket_size(n)
        if self._mesh is not None and 'dp' in self._mesh.axis_names:
            dp = self._mesh.shape['dp']
            bucket = -(-bucket // dp) * dp
        fn = jax.jit(
            lambda p, s, b, xx, r: self.eval_with_buffers(
                p, s, b, xx, r, return_ue=return_ue))
        shapeof = lambda t: jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype), t)
        x_spec = jax.ShapeDtypeStruct((bucket,) + x.shape[1:], x.dtype)
        try:
            compiled = fn.lower(shapeof(self.params), shapeof(self.state),
                                shapeof(self.eval_buffers()),
                                x_spec, self._peek_eval_rng()).compile()
            ma = compiled.memory_analysis()
            total = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                     + ma.output_size_in_bytes - ma.alias_size_in_bytes)
        except Exception:
            return None
        if total <= 0:
            return None
        return total / (1024 * 1024)

    # ------------------------------------------------------------ conversion
    def to(self, target):
        """Cast parameters to a dtype, or place them on a device."""
        if target is None:
            return self
        try:
            dt = np.dtype(target)
            is_dtype = True
        except TypeError:
            is_dtype = False
        if is_dtype:
            if dt == np.float64 and not jax.config.read('jax_enable_x64'):
                dt = np.dtype('float32')   # TPUs run float32/bfloat16
            self.dtype = jnp.dtype(dt)
            cast = lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(self.dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
            if self.params is not None:
                self.params = cast(self.params)
                self.state = cast(self.state)
            self._cast_buffers(cast)
            self.invalidate_cache()
        else:   # a jax.Device
            put = lambda t: jax.tree_util.tree_map(
                lambda a: jax.device_put(a, target), t)
            if self.params is not None:
                self.params = put(self.params)
                self.state = put(self.state)
        return self

    def _cast_buffers(self, cast):
        pass

    def eval(self):
        """No-op kept for API parity; eval behaviour is explicit here."""
        return self

    @property
    def device(self):
        if self.params is not None:
            leaves = jax.tree_util.tree_leaves(self.params)
            if leaves and hasattr(leaves[0], 'devices'):
                return next(iter(leaves[0].devices()))
        return jax.devices()[0]

    # ----------------------------------------------------------- checkpointing
    def config_dict(self) -> dict:
        """Constructor-equivalent config; extended by subclasses."""
        return {
            'class': type(self).__name__,
            'uq_method': self.uq_method,
            'architecture': self.net.architecture,
            'train_config': self.train_config,
            'validation_config': self.validation_config,
        }

    def arrays_dict(self) -> dict:
        """All learned/fitted arrays as a picklable numpy pytree."""
        to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
        d = {'params': to_np(self.params), 'state': to_np(self.state)}
        d.update(self._extra_arrays())
        return d

    def _extra_arrays(self) -> dict:
        return {}

    def load_arrays(self, arrays: dict):
        to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        self.params = _tuplify(to_j(arrays['params']))
        self.state = _tuplify(to_j(arrays['state']))
        self._load_extra_arrays(arrays)
        self.invalidate_cache()

    def _load_extra_arrays(self, arrays: dict):
        pass


def _tuplify(t):
    """Pickle round-trips may turn tuples into lists; restore tuples."""
    if isinstance(t, list):
        return tuple(_tuplify(x) for x in t)
    if isinstance(t, tuple):
        return tuple(_tuplify(x) for x in t)
    return t
