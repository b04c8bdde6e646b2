"""PAGER: Δ-UQ anchoring + conformal anchoring-error score.

Reconstructed from the reference call sites (reference
``nnueehcs/models.py:376-473``):

- the Δ-UQ ``(mean, std)`` is computed as in :class:`DeltaUQMLP`,
- the conformal score of a test sample ``s`` uses the anchored *prediction
  matrix*: entry ``(s, a)`` is the prediction for anchor input ``a`` when
  the network is anchored at ``s`` (the reference's
  ``return_pred_matrix=True`` path, ``models.py:404-429``),
- ``score(s) = max_a | p_matrix[s, a] - anchors_Y[a] |``
  (reference ``models.py:431-434``),
- the final uncertainty is ``max(std, score)`` (reference
  ``models.py:390-402``).

The whole anchors×samples matrix is produced by one batched network pass —
the ``(B, A, 2d)`` anchored inputs collapse into a single ``(B·A, 2d)``
GEMM stack on the MXU, chunked by ``anchored_batch_size`` via the inherited
``__call__``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import EVAL_MODE
from .delta_uq import DeltaUQMLP, anchored_input
from ..training.hooks import PAGERGetAnchorsHook


class PAGERMLP(DeltaUQMLP):
    uq_method = 'pager'

    def __init__(self, net, estimator: str = 'std', anchored_batch_size=None,
                 num_anchors: int = 5, vectorize: bool = True, **kwargs):
        super().__init__(net, estimator=estimator, num_anchors=num_anchors,
                         anchored_batch_size=anchored_batch_size, **kwargs)
        self.vectorize = vectorize
        self._anchors_Y = None

    @property
    def anchors_Y(self):
        return self._anchors_Y

    @anchors_Y.setter
    def anchors_Y(self, value):
        self._anchors_Y = None if value is None else jnp.asarray(np.asarray(value))
        self.invalidate_cache()

    def get_callbacks(self):
        return [PAGERGetAnchorsHook()]

    # ------------------------------------------------------------------ eval
    def _prediction_matrix(self, params, state, x, anchors_X):
        """(B, A) matrix: anchor inputs predicted while anchored at each
        test sample — batched passes with the sample axis chunked so the
        (chunk × A × width) activations stay under the anchor-rows budget
        (see DeltaUQMLP.anchor_rows_budget)."""
        def anchored_at_sample(s):
            inp = anchored_input(anchors_X, jnp.broadcast_to(s, anchors_X.shape))
            y, _ = self.net.apply(params, state, inp, EVAL_MODE, rng=None)
            return y                                   # (A, out)

        B, A = x.shape[0], anchors_X.shape[0]
        g = max(1, min(B, self._rows_budget() // max(A, 1)))
        if g >= B:
            p = jax.vmap(anchored_at_sample)(x)        # (B, A, out)
            return p[..., 0] if p.ndim == 3 else p
        n_groups = -(-B // g)
        pad = n_groups * g - B
        xp = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0) \
            if pad else x

        def body(_, xs):
            return None, jax.vmap(anchored_at_sample)(xs)
        _, p = jax.lax.scan(body, None,
                            xp.reshape(n_groups, g, *x.shape[1:]))
        p = p.reshape(n_groups * g, *p.shape[2:])[:B]
        return p[..., 0] if p.ndim == 3 else p

    def _conformal_scores(self, params, state, x, anchors_X, anchors_Y):
        p_matrix = self._prediction_matrix(params, state, x, anchors_X)
        dev = jnp.abs(p_matrix - anchors_Y.reshape(1, -1))
        return jnp.max(dev, axis=1, keepdims=True)     # (B, 1)

    def eval_buffers(self):
        if self._anchors is None:
            return ()
        if self._anchors_Y is None:
            raise ValueError('PAGER anchors are set but anchors_Y is not; '
                             'conformal scores need both')
        return (self._anchors, self._anchors_Y)

    def eval_with_buffers(self, params, state, buffers, x, rng,
                          return_ue: bool = False):
        res = super().eval_with_buffers(params, state, buffers[:1], x, rng,
                                        return_ue=return_ue)
        if not return_ue or not buffers:
            return res
        pred, uncertainty = res
        scores = self._conformal_scores(
            params, state, x,
            buffers[0][:self.num_anchors],
            buffers[1][:self.num_anchors])
        return pred, jnp.maximum(uncertainty, scores)

    # ----------------------------------------------------------- checkpointing
    def _extra_arrays(self):
        d = super()._extra_arrays()
        d['anchors_Y'] = None if self._anchors_Y is None else np.asarray(self._anchors_Y)
        return d

    def _load_extra_arrays(self, arrays):
        super()._load_extra_arrays(arrays)
        a = arrays.get('anchors_Y')
        self._anchors_Y = None if a is None else jnp.asarray(a)

    def _cast_buffers(self, cast):
        super()._cast_buffers(cast)
        if self._anchors_Y is not None:
            self._anchors_Y = cast(self._anchors_Y)
