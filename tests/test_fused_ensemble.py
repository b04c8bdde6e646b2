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


def test_shifted_stats_no_cancellation():
    """The shifted one-pass variance must survive |mean| >> std (the naive
    E[x^2]-E[x]^2 in f32 collapses around mean ~1e3)."""
    from nnueehcs_tpu.ops.fused_ensemble import _shifted_stats
    rng = np.random.default_rng(0)
    n = 8
    base = jnp.asarray(1000.0 + rng.normal(size=(64, 1)) * 0.01, jnp.float32)
    members = base + jnp.asarray(rng.normal(size=(n, 64, 1)) * 0.01,
                                 jnp.float32)
    c = members[0]
    deltas = members - c
    s1 = jnp.sum(deltas, axis=0)
    s2 = jnp.sum(deltas * deltas, axis=0)
    mean, std = _shifted_stats(s1, s2, c, n)
    ref_mean = np.mean(np.asarray(members, np.float64), axis=0)
    ref_std = np.std(np.asarray(members, np.float64), axis=0, ddof=1)
    assert np.allclose(np.asarray(mean), ref_mean, rtol=1e-6)
    assert np.allclose(np.asarray(std), ref_std, rtol=1e-3)


def test_fused_cache_stale_on_state_swap(model):
    cache = prepare_fused_weights(model.net, model.params, model.state)
    assert not cache.stale_for(model.params, model.state)
    new_state = tuple(dict(s) if s else s for s in model.state)
    assert cache.stale_for(model.params, new_state)
    new_params = tuple(list(model.params))   # same values, new object
    assert cache.stale_for(new_params, model.state)


def test_vmem_budget_rejects_oversized():
    """A net whose weights pass width checks but blow the VMEM budget must
    fall back (return an unfoldable cache) instead of failing to compile."""
    import nnueehcs_tpu.ops.fused_ensemble as FE
    wide = EnsembleModelBuilder(
        [{'Linear': {'args': [6000, 128]}}, {'ReLU': {}},
         {'Linear': {'args': [128, 1]}}], {'num_models': 4}).build()
    cache = prepare_fused_weights(wide.net, wide.params, wide.state)
    assert not cache.folded


def test_mc_fold_extracts_dropout_positions():
    from nnueehcs_tpu.model_builder import MCDropoutModelBuilder
    from nnueehcs_tpu.ops.fused_ensemble import fold_mc_dropout_params
    arch = [{'Linear': {'args': [3, 16]}}, {'ReLU': {}},
            {'Linear': {'args': [16, 16]}}, {'ReLU': {}},
            {'Linear': {'args': [16, 1]}}]
    m = MCDropoutModelBuilder(arch, {'num_samples': 4,
                                     'dropout_percent': 0.25}).build()
    folded, drops = fold_mc_dropout_params(m.net, m.params, m.state)
    assert len(folded) == 3
    # dropout is inserted before *middle* Linears only (the last
    # Linear is excluded by the builder's rewrite rule)
    assert drops == [0.0, 0.25, 0.0]


def test_prepare_honors_bf16_compute_dtype(model):
    """bf16-mixed folds the GEMM operands to bf16 (MXU fast path) while
    biases — which ride the f32 accumulator — stay f32."""
    from nnueehcs_tpu.ops.fused_ensemble import prepare_fused_weights
    model.set_precision('bf16-mixed')
    cache = prepare_fused_weights(model.net, model.params, model.state)
    assert cache.folded
    assert cache.compute_dtype == 'bfloat16'
    assert all(w.dtype == jnp.bfloat16 for w in cache.ws)
    assert all(b.dtype == jnp.float32 for b in cache.bs)
    # f32 default unchanged
    model.set_precision('32-true')
    cache32 = prepare_fused_weights(model.net, model.params, model.state)
    assert cache32.compute_dtype == 'float32'
    assert all(w.dtype == jnp.float32 for w in cache32.ws)


@pytest.mark.parametrize('in_dim', [5, 40])
def test_xt_layout_matches_wide_interpret(in_dim):
    """The transposed-input ('xt') layout is the same math as the classic
    wide layout — the first GEMM contracts dim 0 of both operands instead
    of zero-padding x to 128 lanes.  Pin both layouts against each other
    and against the per-member reference in Pallas interpret mode (CPU),
    at a batch that is not tile-aligned so the row padding/slicing paths
    are exercised."""
    from nnueehcs_tpu.ops.fused_ensemble import fused_ensemble_eval
    descr = [{'Linear': {'args': [in_dim, 32]}},
             {'BatchNorm1d': {'args': [32]}},
             {'ReLU': {}},
             {'Linear': {'args': [32, 32]}},
             {'ReLU': {}},
             {'Linear': {'args': [32, 1]}}]
    m = EnsembleModelBuilder(descr, {'num_models': 3},
                             train_config={'loss': 'l1_loss'}).build()
    x = jnp.asarray(np.random.default_rng(7).normal(size=(300, in_dim)),
                    jnp.float32)
    wide = fused_ensemble_eval(m.net, m.params, m.state, x,
                               layout='wide', interpret=True)
    xt = fused_ensemble_eval(m.net, m.params, m.state, x,
                             layout='xt', interpret=True)
    assert wide is not None and xt is not None
    for a, b in zip(wide, xt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)
    # against the per-member reference forward
    outs = []
    for m_i in range(3):
        params_m = jax.tree_util.tree_map(lambda l: l[m_i], m.params)
        state_m = jax.tree_util.tree_map(lambda l: l[m_i], m.state)
        o, _ = m.net.apply(params_m, state_m, x, EVAL_MODE)
        outs.append(np.asarray(o))
    ref_mean = np.mean(outs, axis=0)
    ref_std = np.std(outs, axis=0, ddof=1)
    np.testing.assert_allclose(np.asarray(xt[0]), ref_mean,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xt[1]), ref_std,
                               rtol=1e-3, atol=1e-5)


def test_xt_layout_pads_first_layer_to_sublane():
    """xt caches pad the first layer's input dim to 8 (f32 sublane
    quantum), not 128 — that is the whole point of the layout."""
    from nnueehcs_tpu.ops.fused_ensemble import prepare_fused_weights
    m = EnsembleModelBuilder(DESCR, {'num_models': 3},
                             train_config={'loss': 'l1_loss'}).build()
    cache_xt = prepare_fused_weights(m.net, m.params, m.state, layout='xt')
    assert cache_xt.layout == 'xt'
    assert cache_xt.dpad == 8           # 5 features -> 8
    assert cache_xt.ws[0].shape[1] == 8
    cache_w = prepare_fused_weights(m.net, m.params, m.state, layout='wide')
    assert cache_w.dpad == 128
