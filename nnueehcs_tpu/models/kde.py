"""KDE and kNN-KDE density-scored models.

The uncertainty score is the negated density of the *input* under a KDE
fitted on epoch-0 training inputs (higher density ⇒ lower uncertainty;
reference ``nnueehcs/models.py:191-285``).  Scoring runs on-device through
:mod:`nnueehcs_tpu.ops.kde` (Pallas on TPU) instead of sklearn's CPU tree.
"""
from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from ..ops.kde import bandwidth_value, kde_logpdf, knn_kde_density
from ..training.hooks import KDEFitHook, KNNKDEFitHook
from .mlp import MLPModel


class _FittedKDE:
    """Minimal stand-in for sklearn's fitted KernelDensity, exposing the
    attributes the reference test-suite asserts on (``bandwidth``, ``rtol``,
    ``score_samples``)."""

    def __init__(self, data, bandwidth, rtol):
        self.data = jnp.asarray(np.asarray(data), jnp.float32)
        self.bandwidth = bandwidth
        self.rtol = rtol
        n, d = self.data.shape
        self.bandwidth_ = bandwidth_value(bandwidth, n, d)

    def score_samples(self, x):
        return kde_logpdf(jnp.asarray(np.asarray(x), jnp.float32),
                          self.data, self.bandwidth_)


class KDEMLPModel(MLPModel):
    uq_method = 'kde'

    def __init__(self, net, bandwidth: Union[str, float] = 'scott',
                 rtol: float = 0.1, train_fit_prop: float = 1.0, **kwargs):
        super().__init__(net, **kwargs)
        self.bandwidth = bandwidth
        self.rtol = rtol / 10000           # reference scaling (models.py:195)
        self.kde: Optional[_FittedKDE] = None
        self.train_fit_prop = train_fit_prop

    def fit_kde(self, data):
        data = np.asarray(data)
        rng = np.random.default_rng(0)
        take = int(self.train_fit_prop * len(data))
        idx = rng.permutation(len(data))[:take]
        self.kde = _FittedKDE(data[idx], self.bandwidth, self.rtol)
        self.invalidate_cache()

    def eval_buffers(self):
        # the fit corpus rides the jit cache as a program argument — as an
        # HLO constant a multi-GB corpus would bloat every compile and be
        # invisible to the per-pass memory analysis
        return () if self.kde is None else (self.kde.data,)

    def _density_score(self, x, data):
        if self._mesh is not None and 'dp' in self._mesh.axis_names and \
                self._mesh.shape['dp'] > 1:
            # fit corpus sharded across the mesh; collective lse merge
            from ..ops.kde import kde_logpdf_sharded
            log_dens = kde_logpdf_sharded(x, data, self.kde.bandwidth_,
                                          self._mesh)
        else:
            log_dens = kde_logpdf(x, data, self.kde.bandwidth_)
        # negate so higher density gets a lower uncertainty score
        return -jnp.exp(log_dens)

    def eval_with_buffers(self, params, state, buffers, x, rng,
                          return_ue: bool = False):
        pred = super().eval_output(params, state, x, rng, return_ue=False)
        if not return_ue:
            return pred
        if self.kde is None:
            raise ValueError('KDE not fitted yet')
        return pred, self._density_score(x, buffers[0])

    def eval_output(self, params, state, x, rng, return_ue: bool = False):
        return self.eval_with_buffers(params, state, self.eval_buffers(),
                                      x, rng, return_ue=return_ue)

    def __call__(self, x, return_ue: bool = False):
        if return_ue and self.kde is None:
            raise ValueError('KDE not fitted yet')
        return super().__call__(x, return_ue=return_ue)

    def get_callbacks(self):
        return [KDEFitHook()]

    def config_dict(self):
        d = super().config_dict()
        d['bandwidth'] = self.bandwidth
        d['rtol'] = self.rtol * 10000
        d['train_fit_prop'] = self.train_fit_prop
        return d

    def _extra_arrays(self):
        return {'kde_data': None if self.kde is None else np.asarray(self.kde.data)}

    def _load_extra_arrays(self, arrays):
        data = arrays.get('kde_data')
        if data is not None:
            self.kde = _FittedKDE(data, self.bandwidth, self.rtol)


class KNNKDEMLPModel(MLPModel):
    uq_method = 'knn_kde'

    def __init__(self, net, bandwidth: Union[str, float] = 'scott', k: int = 10,
                 train_fit_prop: float = 1.0, knn_exact='auto', **kwargs):
        super().__init__(net, **kwargs)
        self.bandwidth = bandwidth
        self.k = k
        self.train_fit_prop = train_fit_prop
        # exactness contract (config-visible as uq_config.knn_exact):
        # True = exact top-k always (the reference's external KNNKDE is
        # exact); False = TPU approx_max_k fast path (recall ~0.98);
        # 'auto' = exact below ops.kde.KNN_EXACT_AUTO_PAIRS pairs
        self.knn_exact = knn_exact
        self._fit_data = None
        self._bandwidth_value = None

    def fit_kde(self, data):
        data = np.asarray(data)
        rng = np.random.default_rng(0)
        take = int(self.train_fit_prop * len(data))
        idx = rng.permutation(len(data))[:take]
        self._fit_data = jnp.asarray(data[idx], jnp.float32)
        n, d = self._fit_data.shape
        self._bandwidth_value = bandwidth_value(self.bandwidth, n, d)
        self.invalidate_cache()

    def eval_buffers(self):
        return () if self._fit_data is None else (self._fit_data,)

    def eval_with_buffers(self, params, state, buffers, x, rng,
                          return_ue: bool = False):
        pred = super().eval_output(params, state, x, rng, return_ue=False)
        if not return_ue:
            return pred
        if self._fit_data is None:
            raise ValueError('KDE not fitted yet')
        data = buffers[0]
        if self._mesh is not None and 'dp' in self._mesh.axis_names and \
                self._mesh.shape['dp'] > 1:
            # fit corpus sharded across the mesh: per-device top-k, ICI
            # all-gather merge (ops.kde.knn_sq_dists_sharded)
            from ..ops.kde import knn_kde_density_sharded
            dens = knn_kde_density_sharded(x, data, self._bandwidth_value,
                                           self.k, self._mesh,
                                           exact=self.knn_exact)
        else:
            dens = knn_kde_density(x, data, self._bandwidth_value, self.k,
                                   exact=self.knn_exact)
        return pred, -dens

    def eval_output(self, params, state, x, rng, return_ue: bool = False):
        return self.eval_with_buffers(params, state, self.eval_buffers(),
                                      x, rng, return_ue=return_ue)

    def __call__(self, x, return_ue: bool = False):
        if return_ue and self._fit_data is None:
            raise ValueError('KDE not fitted yet')
        return super().__call__(x, return_ue=return_ue)

    def get_callbacks(self):
        return [KNNKDEFitHook()]

    def config_dict(self):
        d = super().config_dict()
        d['bandwidth'] = self.bandwidth
        d['k'] = self.k
        d['train_fit_prop'] = self.train_fit_prop
        d['knn_exact'] = self.knn_exact
        return d

    def _extra_arrays(self):
        return {'knn_fit_data': None if self._fit_data is None
                else np.asarray(self._fit_data)}

    def _load_extra_arrays(self, arrays):
        data = arrays.get('knn_fit_data')
        if data is not None:
            # data was already subsampled at fit time — install it verbatim
            self._fit_data = jnp.asarray(data, jnp.float32)
            n, d = self._fit_data.shape
            self._bandwidth_value = bandwidth_value(self.bandwidth, n, d)
