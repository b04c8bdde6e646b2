"""Fused anchored (Δ-UQ/PAGER) eval kernel: fold/split correctness,
gating, and parity with the vmapped anchored path (interpret mode on CPU;
the same kernel runs compiled on TPU).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnueehcs_tpu.model_builder import (DeltaUQMLPModelBuilder,
                                        PAGERModelBuilder)
from nnueehcs_tpu.ops import fused_anchored as fa


def _arch(d=5, width=32, depth=2, bn=True):
    arch = [{'Linear': {'args': [d, width]}}]
    if bn:
        arch.append({'BatchNorm1d': {'args': [width]}})
    arch.append({'ReLU': {}})
    for _ in range(depth - 1):
        arch.append({'Linear': {'args': [width, width]}})
        if bn:
            arch.append({'BatchNorm1d': {'args': [width]}})
        arch.append({'ReLU': {}})
    arch.append({'Linear': {'args': [width, 1]}})
    return arch


def _build(num_anchors=7, estimator='std', d=5, **kw):
    model = DeltaUQMLPModelBuilder(
        _arch(d=d, **kw), {'estimator': estimator,
                           'num_anchors': num_anchors},
        train_config={'loss': 'l1_loss'}).build()
    rng = np.random.default_rng(3)
    model.anchors = rng.normal(size=(num_anchors, d)).astype(np.float32)
    return model


@pytest.fixture
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl
    monkeypatch.setattr(pl, 'pallas_call',
                        functools.partial(pl.pallas_call, interpret=True))


def test_prepare_splits_first_layer():
    model = _build()
    cache = fa.prepare_fused_anchored(model.net, model.params, model.state)
    assert cache.folded
    assert cache.in_dim == 5
    assert cache.w0x.shape == (128, 128)
    assert cache.w0d.shape[0] == 5
    assert len(cache.ws) == 2            # hidden + output Linear
    assert cache.relu0 is True
    assert cache.out_dim == 1
    assert not cache.stale_for(model.params, model.state)
    fresh = jax.tree_util.tree_map(lambda v: v, model.params)
    assert cache.stale_for(fresh, model.state)


def test_prepare_rejects_odd_input_width():
    # a non-anchored net (first Linear in_features odd) must not fold
    from nnueehcs_tpu.model_builder import MLPModelBuilder
    m = MLPModelBuilder([{'Linear': {'args': [5, 16]}}, {'ReLU': {}},
                         {'Linear': {'args': [16, 1]}}],
                        train_config={'loss': 'l1_loss'}).build()
    cache = fa.prepare_fused_anchored(m.net, m.params, m.state)
    assert not cache.folded


def test_prepare_rejects_wide_layers():
    model = _build(width=256)
    cache = fa.prepare_fused_anchored(model.net, model.params, model.state)
    assert not cache.folded


@pytest.mark.parametrize('estimator', ['std', 'var'])
def test_fused_matches_vmap_path(interpret_pallas, estimator):
    """The kernel's (mean, spread) must match the vmapped anchored path
    at float32 roundoff, for both estimators, through the PUBLIC stats
    API (same params/state/anchors)."""
    model = _build(num_anchors=9, estimator=estimator)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 5)), jnp.float32)

    ref_mean, ref_spread = model._anchored_stats(
        model.params, model.state, x, model.anchors, model.num_anchors)

    cache = fa.prepare_fused_anchored(model.net, model.params, model.state)
    assert cache.folded
    mean, std = fa.fused_anchored_stats(cache, x, model.anchors,
                                        model.num_anchors)
    spread = std * std if estimator == 'var' else std
    np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(spread), np.asarray(ref_spread),
                               atol=2e-5, rtol=1e-3)


def test_fused_matches_vmap_no_batchnorm(interpret_pallas):
    model = _build(num_anchors=5, bn=False)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(32, 5)), jnp.float32)
    ref_mean, ref_std = model._anchored_stats(
        model.params, model.state, x, model.anchors, model.num_anchors)
    cache = fa.prepare_fused_anchored(model.net, model.params, model.state)
    mean, std = fa.fused_anchored_stats(cache, x, model.anchors,
                                        model.num_anchors)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(std), np.asarray(ref_std),
                               atol=2e-5, rtol=1e-3)


def test_fused_respects_num_anchors_subset(interpret_pallas):
    """n_anchors < stored anchors: only the first n contribute (the
    reference slices anchors the same way)."""
    model = _build(num_anchors=8)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(16, 5)), jnp.float32)
    cache = fa.prepare_fused_anchored(model.net, model.params, model.state)
    m4, s4 = fa.fused_anchored_stats(cache, x, model.anchors, 4)
    ref_m, ref_s = model._anchored_stats(model.params, model.state, x,
                                         model.anchors, 4)
    np.testing.assert_allclose(np.asarray(m4), np.asarray(ref_m),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s4), np.asarray(ref_s),
                               atol=2e-5, rtol=1e-3)


def test_pager_net_folds():
    """PAGER's anchored net folds through the same cache (its Δ-UQ
    mean/std shares the kernel; the conformal matrix stays on vmap)."""
    model = PAGERModelBuilder(_arch(), {'estimator': 'std'},
                              train_config={'loss': 'l1_loss'}).build()
    cache = fa.prepare_fused_anchored(model.net, model.params, model.state)
    assert cache.folded


def test_stateful_eval_path_gates_fused(monkeypatch):
    """On CPU the fused path must not engage (TPU-only); the flag is
    reset even if the eval raises."""
    model = _build()
    rng = np.random.default_rng(5)
    x = rng.normal(size=(8, 5)).astype(np.float32)
    pred, ue = model(x, return_ue=True)
    assert not getattr(model, '_fused_active')
    assert pred.shape == (8, 1) and ue.shape == (8, 1)


def test_fused_anchored_is_opt_in(monkeypatch):
    """The fused anchored kernel is opt-in (NNUEEHCS_TPU_FUSED_ANCHORED):
    the round-4 anchored bench measured the XLA anchor-vmap path 15%
    faster at the flagship shape, so the vmap path is the default even
    on TPU.  Without the opt-in env, no fused cache may be prepared."""
    model = _build()
    rng = np.random.default_rng(6)
    x = rng.normal(size=(8, 5)).astype(np.float32)
    monkeypatch.delenv('NNUEEHCS_TPU_FUSED_ANCHORED', raising=False)
    # force the TPU-side gate open so only the opt-in decides
    monkeypatch.setattr(type(model), '_use_fused_eval', lambda self: True)
    model.invalidate_cache()
    model(x, return_ue=True)
    assert getattr(model, '_fused_cache', None) is None
    # with the opt-in set, the cache is prepared (folded only on real
    # TPU lowering paths; on CPU prepare may still fold — engagement is
    # what the production gate controls)
    monkeypatch.setenv('NNUEEHCS_TPU_FUSED_ANCHORED', '1')
    model.invalidate_cache()
    try:
        model(x, return_ue=True)
    except Exception:
        pass   # CPU cannot lower the kernel; preparing the cache is enough
    assert getattr(model, '_fused_cache', None) is not None


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='compiled Pallas lowering requires TPU')
def test_fused_anchored_compiles_on_tpu():
    """REAL hardware lowering check: interpret mode accepts primitives the
    TPU compiler rejects (dynamic_slice burned a live grid cell in r4), so
    the kernel must compile and match the vmap path on-chip."""
    model = _build(num_anchors=12, width=128, depth=6)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2048, 5)), jnp.float32)
    import os
    os.environ['NNUEEHCS_TPU_NO_FUSED'] = '1'
    try:
        rm, rs = model(x, return_ue=True)
    finally:
        del os.environ['NNUEEHCS_TPU_NO_FUSED']
    model.invalidate_cache()
    fm, fs = model(x, return_ue=True)
    assert model._fused_cache is not None and model._fused_cache.folded
    np.testing.assert_allclose(np.asarray(fm), np.asarray(rm), atol=5e-4)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(rs), atol=5e-4)
