"""Δ-UQ (anchoring / stochastic data centering) implemented natively.

The reference depends on the external LLNL ``deltauq`` package, whose
behaviour was reconstructed from its call sites (reference
``nnueehcs/models.py:288-373``, ``nnueehcs/model_builder.py:160-189``):

- the base network's first layer takes ``2 * num_inputs`` features — the
  anchored input is ``concat([anchor, x - anchor])`` on the feature axis,
- **training**: the forward pass returns predictions for a *doubled* batch
  (the training target is ``cat((y, y))`` — reference ``models.py:306-311``).
  Each half is the batch anchored against an independent random permutation
  of itself (stochastic data centering),
- **evaluation**: ``num_anchors`` anchored passes against stored training
  anchors, returning ``(mean, std)`` — here a single ``vmap`` over the
  anchor axis inside one jitted program,
- anchors are the first ``num_anchors`` training inputs, captured at the
  end of epoch 0 by a trainer hook (reference ``models.py:354-369``),
- evaluation is chunked by ``anchored_batch_size`` to bound the
  ``num_anchors × batch`` intermediate (reference ``models.py:313-341``).
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import TRAIN_MODE, EVAL_MODE
from .base import WrappedModelBase, _std_unbiased
from ..training.hooks import DeltaUQGetAnchorsHook


def anchored_input(x, anchor):
    """``concat([anchor, x - anchor])`` along the feature axis.

    For flat ``(B, F)`` inputs that is the last axis; for NCHW image
    batches it is the *channel* axis — the builders double the first
    Conv2d's ``in_channels`` for CNN architectures (reference imports
    ``deltaUQ_CNN``, ``nnueehcs/models.py:2``), so the anchored tensor
    must stack along channels, not image width."""
    axis = -3 if x.ndim >= 4 else -1
    return jnp.concatenate([anchor, x - anchor], axis=axis)


class DeltaUQMLP(WrappedModelBase):
    uq_method = 'delta_uq'

    #: Cap on the number of anchors used for *validation-loss* passes during
    #: training.  The reference validates through the full ``num_anchors``
    #: anchored eval every epoch (reference ``models.py:313-341`` driven by
    #: Lightning's ``validation_step``), and the out-of-the-box default here
    #: is the same (``None`` = no cap, reference-faithful numerics).  Setting
    #: ``val_num_anchors`` (e.g. 16, what the banked experiment grid ran
    #: with — configs pin it explicitly) caps the validation pass: at 500
    #: anchors × 12.8k val rows × 300 epochs the full validation dominates
    #: trial wall-clock (~10-35 min/trial measured) while only steering
    #: early-stop/best-checkpoint selection — the anchored *mean* converges
    #: with a handful of anchors (docs/PARITY.md).  The UE/eval path
    #: (``eval_output`` / ``eval_with_buffers`` / timed passes) always uses
    #: the full ``num_anchors`` and is pinned by
    #: ``tests/test_uq_switches.py``.
    DEFAULT_VAL_NUM_ANCHORS = None

    def __init__(self, net, estimator: str = 'std', num_anchors: int = 5,
                 anchored_batch_size=None, val_num_anchors='default',
                 **kwargs):
        super().__init__(net, **kwargs)
        if estimator not in ('std', 'var'):
            raise ValueError(f'Unknown estimator {estimator!r}')
        self.estimator = estimator
        self.num_anchors = num_anchors
        self.val_num_anchors = self.DEFAULT_VAL_NUM_ANCHORS \
            if val_num_anchors == 'default' else val_num_anchors
        self.batch_size = sys.maxsize if anchored_batch_size is None \
            else anchored_batch_size
        self._anchors = None

    # ------------------------------------------------------------- anchors
    @property
    def anchors(self):
        return self._anchors

    @anchors.setter
    def anchors(self, value):
        self._anchors = None if value is None else jnp.asarray(np.asarray(value))
        self.invalidate_cache()

    def get_callbacks(self):
        return [DeltaUQGetAnchorsHook()]

    # ------------------------------------------------------------- training
    def train_output(self, params, state, x, rng):
        b = x.shape[0]
        k1, k2, krest = (jax.random.fold_in(rng, i) for i in range(3)) if rng is not None \
            else (jax.random.PRNGKey(0),) * 3
        a1 = x[jax.random.permutation(k1, b)]
        a2 = x[jax.random.permutation(k2, b)]
        doubled = jnp.concatenate(
            [anchored_input(x, a1), anchored_input(x, a2)], axis=0)
        return self.net.apply(params, state, doubled, TRAIN_MODE, rng=krest)

    def train_targets(self, y):
        return jnp.concatenate([y, y], axis=0)

    # ----------------------------------------------------------------- eval
    # anchor-axis memory bound: the vmapped pass materialises
    # (anchor_group × batch × width) activations; cap the product at ~1M
    # rows (~0.5 GB of f32 at width 128) like MC dropout's sample groups.
    # The reference never hits this because the external package loops
    # anchors one at a time (at proportional wall-clock cost).
    anchor_rows_budget = 1 << 20
    # floor for the anchored_batch_size-derived budget (see _rows_budget)
    MIN_ROWS_BUDGET = 1 << 16

    def _rows_budget(self):
        """In-flight anchored-row bound for the grouped eval scan.

        The reference's ``anchored_batch_size`` chunks the eval batch on
        the *host* (reference ``models.py:313-341``) — each chunk is a
        cheap CUDA relaunch there, so it is purely a GPU-memory bound.
        On a tunneled TPU every host chunk costs a full dispatch RTT
        (~33 ms): chunking a 16.7 M-row pass by ``anchored_batch_size =
        229`` means ~73,000 dispatches ≈ 40 min *per pass* — observed
        live in the round-3 grid.  The bound therefore moves INSIDE the
        compiled program: the grouped anchor scan keeps at most
        ``min(anchor_rows_budget, max(num_anchors × anchored_batch_size,
        MIN_ROWS_BUDGET))`` anchored rows in flight, preserving the
        parameter's memory intent at one dispatch per batch bucket."""
        if self.batch_size == sys.maxsize:
            return self.anchor_rows_budget
        return min(self.anchor_rows_budget,
                   max(self.num_anchors * self.batch_size,
                       self.MIN_ROWS_BUDGET))

    def _anchored_stats(self, params, state, x, anchors, n_anchors):
        """Mean/std over ``n_anchors`` anchored passes, vmapped over the
        anchor axis in memory-bounded groups (replaces the reference's
        python loop in the external package).  On the stateful eval path
        (TPU, fusable arch) the whole computation runs as one Pallas
        kernel with the anchor loop on-chip — see ops/fused_anchored.py."""
        B = x.shape[0]

        if getattr(self, '_fused_active', False) and x.ndim == 2 \
                and min(n_anchors, anchors.shape[0]) >= 2:
            from ..ops.fused_anchored import fused_anchored_stats
            mean, std = fused_anchored_stats(self._fused_cache, x,
                                             anchors, n_anchors)
            spread = std * std if self.estimator == 'var' else std
            return mean.astype(x.dtype), spread.astype(x.dtype)

        def group_preds(a_group):
            def one_anchor(a):
                inp = anchored_input(x, jnp.broadcast_to(a, x.shape))
                y, _ = self.net.apply(params, state, inp, EVAL_MODE,
                                      rng=None)
                return y
            return jax.vmap(one_anchor)(a_group)             # (g, B, out)

        A = anchors[:n_anchors]
        k = A.shape[0]                   # may be < n_anchors (few anchors)
        g = max(1, min(k, self._rows_budget() // max(B, 1)))
        if g >= k:
            # accumulate anchor statistics in f32 regardless of the net's
            # compute dtype (bf16-mixed runs the anchored GEMMs on the MXU
            # fast path; the anchor-axis mean/std must not lose precision)
            preds = group_preds(A).astype(jnp.float32)
            mean = preds.mean(0)
            if self.estimator == 'var':
                spread = jnp.var(preds, axis=0, ddof=1)
            else:
                spread = _std_unbiased(preds, axis=0)
            return mean.astype(x.dtype), spread.astype(x.dtype)

        # grouped scan combining per-group (count, mean, M2) with Chan's
        # parallel-variance update — single pass and numerically stable
        # (a raw Σp²−n·mean² accumulation cancels catastrophically in f32
        # for outputs with large means), padded anchors masked out
        n_groups = -(-k // g)
        pad = n_groups * g - k
        if pad:
            A = jnp.concatenate(
                [A, jnp.zeros((pad,) + A.shape[1:], A.dtype)], axis=0)
        A = A.reshape(n_groups, g, *A.shape[1:])
        w = (jnp.arange(n_groups * g) < k).astype(jnp.float32)
        w = w.reshape(n_groups, g)

        # derive the output shape by tracing (the wrapped net may end in an
        # activation/BN rather than a Linear with an out_features attr)
        out_shape = jax.eval_shape(group_preds, A[0]).shape[1:]
        zero = jnp.zeros(out_shape, jnp.float32)

        def body(carry, inp):
            n, mean, M2 = carry
            a_g, w_g = inp
            p = group_preds(a_g).astype(jnp.float32)
            wg = w_g[:, None, None]
            cg = jnp.sum(w_g)                       # ≥ 1 (pad < g)
            mean_g = jnp.sum(p * wg, axis=0) / cg
            M2_g = jnp.sum(wg * jnp.square(p - mean_g[None]), axis=0)
            delta = mean_g - mean
            n_new = n + cg
            mean_new = mean + delta * (cg / n_new)
            M2_new = M2 + M2_g + jnp.square(delta) * (n * cg / n_new)
            return (n_new, mean_new, M2_new), None

        (n, mean, M2), _ = jax.lax.scan(
            body, (jnp.float32(0.0), zero, zero), (A, w))
        var = M2 / (n - 1.0)
        spread = var if self.estimator == 'var' else jnp.sqrt(var)
        return mean.astype(x.dtype), spread.astype(x.dtype)

    def eval_buffers(self):
        # anchors ride the jit cache as program arguments (see base)
        return () if self._anchors is None else (self._anchors,)

    def invalidate_cache(self):
        super().invalidate_cache()
        self._fused_cache = None

    def __call__(self, x, return_ue: bool = False):
        """Stateful eval: routes the anchored mean/std through the fused
        VMEM-resident kernel when the architecture allows (mirrors
        EnsembleModel.__call__ — the folded weights bake the parameter
        version, so the cache and the traces embedding it are dropped
        whenever params/state are replaced).  Traced training/validation
        passes never see the fused path: ``_fused_active`` is only set
        here, and validation_loss runs with live traced parameters."""
        self._fused_active = False
        if self.initialized:
            cache = getattr(self, '_fused_cache', None)
            if cache is not None and cache.stale_for(self.params, self.state):
                self.invalidate_cache()   # also clears _fused_cache
                cache = None
            # The fused anchored kernel is OPT-IN (NNUEEHCS_TPU_FUSED_ANCHORED=1):
            # the round-4 anchored bench measured the XLA anchor-vmap path
            # 15% FASTER (430M vs 375M anchored rows/s at the flagship
            # 65536×229 shape, spreads ≤1.1%) — XLA's loop fusion over the
            # anchor axis beats the hand kernel here, consistent with the
            # round-1 negative result (docs/BENCHMARKS.md).
            import os
            opt_in = (os.environ.get('NNUEEHCS_TPU_FUSED_ANCHORED', '')
                      .strip().lower()
                      not in ('', '0', 'false', 'no', 'off'))
            if cache is None and opt_in and self._use_fused_eval():
                from ..ops.fused_anchored import prepare_fused_anchored
                cache = prepare_fused_anchored(self.net, self.params,
                                               self.state)
                self._fused_cache = cache
            self._fused_active = (cache is not None and cache.folded
                                  and opt_in and self._use_fused_eval())
        try:
            return super().__call__(x, return_ue=return_ue)
        finally:
            self._fused_active = False

    def eval_with_buffers(self, params, state, buffers, x, rng,
                          return_ue: bool = False):
        if not buffers:
            if return_ue:
                print('WARNING: Returning UE without anchors')
            # No anchors yet: fall back to the training-style doubled
            # forward, as the reference does (``models.py:319-322``).
            fixed = jax.random.PRNGKey(0)
            y, _ = self.train_output(params, state, x, fixed)
            return y
        mean, spread = self._anchored_stats(
            params, state, x, buffers[0], self.num_anchors)
        if return_ue:
            return mean, spread
        return mean

    def eval_output(self, params, state, x, rng, return_ue: bool = False):
        return self.eval_with_buffers(params, state, self.eval_buffers(),
                                      x, rng, return_ue=return_ue)

    def validation_loss(self, params, state, batch, rng):
        # The doubled-forward fallback (no anchors) yields 2B outputs; match
        # the reference's loss-vs-doubled-target there.  With anchors set,
        # the anchored mean is computed over at most ``val_num_anchors``
        # anchors (see DEFAULT_VAL_NUM_ANCHORS for the rationale); the
        # eval/UE path is unaffected.
        x, y = batch
        buffers = self.eval_buffers()
        if not buffers:
            out = self.eval_output(params, state, x, rng, return_ue=False)
            if out.shape[0] == 2 * y.shape[0]:
                y = jnp.concatenate([y, y], axis=0)
            return self.loss(out, y)
        n = self.num_anchors if self.val_num_anchors is None \
            else min(self.num_anchors, self.val_num_anchors)
        mean, _ = self._anchored_stats(params, state, x, buffers[0], n)
        return self.loss(mean, y)

    # ------------------------------------------------------------- chunking
    # NOTE: no host-level chunking by ``anchored_batch_size`` here — its
    # memory bound is enforced inside the compiled program (_rows_budget);
    # the base class's bucket chunking alone bounds the batch axis.

    # ----------------------------------------------------------- checkpointing
    def config_dict(self):
        d = super().config_dict()
        d['estimator'] = self.estimator
        d['num_anchors'] = self.num_anchors
        d['val_num_anchors'] = self.val_num_anchors
        d['anchored_batch_size'] = None if self.batch_size == sys.maxsize \
            else self.batch_size
        return d

    def _extra_arrays(self):
        return {'anchors': None if self._anchors is None else np.asarray(self._anchors)}

    def _load_extra_arrays(self, arrays):
        a = arrays.get('anchors')
        self._anchors = None if a is None else jnp.asarray(a)

    def _cast_buffers(self, cast):
        if self._anchors is not None:
            self._anchors = cast(self._anchors)
