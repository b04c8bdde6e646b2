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
import jax.numpy as jnp

from ..nn.layers import MC_EVAL_MODE, Dropout
from ..nn.network import Network
from .base import WrappedModelBase


class MCDropoutModel(WrappedModelBase):
    uq_method = 'mc_dropout'

    def __init__(self, net, num_samples: int = 100, dropout_percent: float = 0.5,
                 vectorize: bool = True, prng_impl: str = None, **kwargs):
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
        # threefry dominates the pass (measured 83% of runtime — 5.9x
        # speedup from the hardware-friendly rbg counter generator on a
        # v5e chip at 262k rows × 128 samples).  rbg is the default for
        # the *sampling path only* but is NOT stable across backends, so
        # out-of-the-box MC streams differ CPU-vs-TPU.  ``prng_impl`` is a
        # config-visible knob (``uq_config.mc_dropout.prng_impl:
        # threefry2x32`` gives the fully-specified, cross-backend-stable
        # stream — pinned in tests/test_uq_switches.py); the
        # NNUEEHCS_TPU_PRNG_IMPL env var overrides it for ad-hoc A/B.
        import os
        impl = os.environ.get('NNUEEHCS_TPU_PRNG_IMPL') or prng_impl or 'rbg'
        self._prng_impl = impl
        self.prng_impl = impl
        self.reseed(0)

    def reseed(self, seed: int):
        """Reset the sampling stream.  Two consecutive evaluations draw
        *different* MC samples (a per-call counter is folded into the key,
        matching the reference's consumption of torch's global RNG);
        ``reseed(s)`` restores reproducibility — the next call repeats the
        stream of the first call after any ``reseed(s)``."""
        self._base_key = jax.random.key(seed, impl=self._prng_impl)
        self._eval_calls = 0
        # kept for backward compatibility: the key the *next* call will use
        self._sample_key = jax.random.fold_in(self._base_key, 0)
        return self

    def _eval_rng(self):
        k = jax.random.fold_in(self._base_key, self._eval_calls)
        self._eval_calls += 1
        self._sample_key = k
        return k

    def _peek_eval_rng(self):
        # the stream must not advance: a memory-analysis lowering between
        # two eval calls would otherwise shift every subsequent sample
        return jax.random.fold_in(self._base_key, self._eval_calls)

    # ------------------------------------------------------ fused fast path
    def __call__(self, x, return_ue: bool = False):
        """Stateful eval: MC sampling runs as one Pallas program per batch
        tile (weights VMEM-resident, dropout masks from the on-chip PRNG)
        when the architecture allows.  The random stream differs from the
        jax.random path — statistically equivalent dropout (verified: the
        deviation matches inter-seed sampling noise)."""
        self._fused_active = False
        # a pinned threefry2x32 stream is a reproducibility contract: the
        # fused kernel's on-chip PRNG is a different stream, so it must
        # not engage when the user asked for the fully-specified stream
        if (self._use_fused_eval() and self.initialized
                and self.prng_impl != 'threefry2x32'):
            self._fused_active = True
        try:
            return super().__call__(x, return_ue=return_ue)
        finally:
            self._fused_active = False

    # max samples per vmapped group: bounds the (group, batch, width)
    # intermediates (activations + dropout masks per layer) so huge eval
    # batches with many MC samples fit HBM
    sample_chunk = 16

    def _group_size(self, batch: int) -> int:
        # keep group × batch under ~1M sample-rows (~0.5 GB of f32
        # activations per live buffer at width 128)
        return max(1, min(self.sample_chunk, (1 << 20) // max(batch, 1)))

    def eval_output(self, params, state, x, rng, return_ue: bool = False):
        if getattr(self, '_fused_active', False):
            from ..ops.fused_ensemble import fused_mc_dropout_eval
            # thread the model's PRNG stream into the kernel's on-chip
            # generator: the fused seed is a pure function of the same
            # per-call key the jax.random path would consume
            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(rng, (), jnp.uint32), jnp.int32)
            out = fused_mc_dropout_eval(self.net, params, state, x,
                                        self.num_samples, seed=seed)
            if out is not None:
                mean, std = out
                mean = mean.astype(x.dtype)
                if return_ue:
                    return mean, std.astype(x.dtype)
                return mean
        s = self.num_samples
        g = min(self._group_size(x.shape[0]), s)
        n_groups = -(-s // g)
        keys = jax.random.split(rng, n_groups * g)
        keys = keys.reshape((n_groups, g) + keys.shape[1:])
        # mask padded samples out of the statistics
        valid = (jnp.arange(n_groups * g) < s).reshape(n_groups, g)

        # deterministic (no-dropout) forward as the variance shift: the
        # accumulated deltas are on the sampling-noise scale, so the
        # one-pass variance formula never cancels when |mean| >> std
        from ..nn.layers import EVAL_MODE
        c, _ = self.net.apply(params, state, x, EVAL_MODE, rng=None)
        c = c.astype(jnp.float32)

        def single(key):
            y, _ = self.net.apply(params, state, x, MC_EVAL_MODE, rng=key)
            return y

        def group_stats(inp):
            gkeys, gvalid = inp
            preds = jax.vmap(single)(gkeys)            # (g, B, out)
            d = preds.astype(jnp.float32) - c[None]
            w = gvalid.astype(jnp.float32).reshape(
                -1, *([1] * (preds.ndim - 1)))
            return jnp.sum(d * w, axis=0), jnp.sum(d * d * w, axis=0)

        if n_groups == 1:
            s1, s2 = group_stats((keys[0], valid[0]))
        else:
            sums = jax.lax.map(group_stats, (keys, valid))
            s1 = jnp.sum(sums[0], axis=0)
            s2 = jnp.sum(sums[1], axis=0)

        m1 = s1 / s
        mean = c + m1
        if return_ue:
            var = jnp.maximum(s2 - s * m1 * m1, 0.0) / max(s - 1, 1)
            return mean.astype(x.dtype), jnp.sqrt(var).astype(x.dtype)
        return mean.astype(x.dtype)

    def config_dict(self):
        d = super().config_dict()
        d['num_samples'] = self.num_samples
        d['dropout_percent'] = self.dropout_percent
        # checkpoint bundles restore the same sampling stream family
        d['prng_impl'] = self.prng_impl
        return d
