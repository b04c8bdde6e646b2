"""Behaviour-switch tests for advertised-but-rarely-used modes:
``ensemble_loss: per_member`` (models/ensemble.py) and the ΔUQ/PAGER
``estimator: 'var'`` spread (models/delta_uq.py, models/pager.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnueehcs_tpu.model_builder import (EnsembleModelBuilder,
                                        DeltaUQMLPModelBuilder,
                                        PAGERModelBuilder)
from nnueehcs_tpu.training import Trainer, DataLoader, ArrayDataset


DESCR = [{'Linear': {'args': [4, 32]}}, {'ReLU': {}},
         {'Linear': {'args': [32, 1]}}]


def _data(n=64, d=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x, x.sum(1, keepdims=True).astype(np.float32)


# ---------------------------------------------------------------------------
# ensemble_loss: per_member
# ---------------------------------------------------------------------------
class TestPerMemberEnsembleLoss:
    def _model(self, mode):
        m = EnsembleModelBuilder(
            DESCR, {'num_models': 3},
            train_config={'loss': 'l1_loss', 'ensemble_loss': mode}).build()
        m.init(jax.random.PRNGKey(0), (4,))
        return m

    def test_semantics_vs_joint_mean(self):
        """per_member averages member-wise losses; joint_mean takes the loss
        of the averaged prediction.  Verify each against a hand-rolled
        computation on the same parameters."""
        x, y = _data()
        m_pm = self._model('per_member')
        m_jm = self._model('joint_mean')
        m_jm.params, m_jm.state = m_pm.params, m_pm.state

        rng = jax.random.PRNGKey(1)
        loss_pm, _ = m_pm.training_loss(m_pm.params, m_pm.state, (x, y), rng)
        loss_jm, _ = m_jm.training_loss(m_jm.params, m_jm.state, (x, y), rng)

        outs, _ = m_pm._member_apply(
            __import__('nnueehcs_tpu.nn.layers', fromlist=['TRAIN_MODE']
                       ).TRAIN_MODE)(m_pm.params, m_pm.state, x, rng)
        outs = np.asarray(outs)                       # (N, B, 1)
        manual_pm = np.mean(np.abs(outs - y[None]))
        manual_jm = np.mean(np.abs(outs.mean(0) - y))
        assert float(loss_pm) == pytest.approx(manual_pm, rel=1e-5)
        assert float(loss_jm) == pytest.approx(manual_jm, rel=1e-5)
        # with diverse member inits the two losses genuinely differ
        assert abs(float(loss_pm) - float(loss_jm)) > 1e-4

    def test_per_member_trains_end_to_end(self, tmp_path):
        x, y = _data(128)
        m = EnsembleModelBuilder(
            DESCR, {'num_models': 3},
            train_config={'loss': 'l1_loss', 'learning_rate': 1e-2,
                          'ensemble_loss': 'per_member'}).build()
        tr = Trainer('pm', {'accelerator': 'cpu', 'max_epochs': 40,
                            'overfit_batches': 1},
                     callbacks=[], log_dir=str(tmp_path))
        tr.fit(m, DataLoader(ArrayDataset(x, y), batch_size=64))
        assert tr.callback_metrics['val_loss'] < 1.0
        # per-member training keeps members diverse → a real UE signal
        preds, ue = m(x, return_ue=True)
        assert np.asarray(ue).shape == (128, 1)
        assert float(np.mean(np.asarray(ue))) > 0


# ---------------------------------------------------------------------------
# delta_uq / pager estimator: 'var'
# ---------------------------------------------------------------------------
class TestVarEstimator:
    def _delta(self, estimator):
        m = DeltaUQMLPModelBuilder(
            DESCR, {'estimator': estimator, 'num_anchors': 4}).build()
        m.init(jax.random.PRNGKey(0), (8,))   # builder doubles input features
        return m

    def test_var_is_square_of_std(self):
        x, _ = _data(32)
        m_std = self._delta('std')
        m_var = self._delta('var')
        m_var.params, m_var.state = m_std.params, m_std.state
        anchors = _data(8, seed=3)[0]
        m_std.anchors = anchors
        m_var.anchors = anchors

        _, ue_std = m_std(x, return_ue=True)
        _, ue_var = m_var(x, return_ue=True)
        np.testing.assert_allclose(np.asarray(ue_var),
                                   np.asarray(ue_std) ** 2,
                                   rtol=1e-4, atol=1e-7)

    def test_invalid_estimator_rejected(self):
        with pytest.raises(ValueError):
            DeltaUQMLPModelBuilder(
                DESCR, {'estimator': 'nope', 'num_anchors': 4}).build()

    def test_pager_accepts_var(self):
        x, y = _data(32)
        m = PAGERModelBuilder(
            DESCR, {'estimator': 'var', 'num_anchors': 4}).build()
        m.init(jax.random.PRNGKey(0), (8,))
        m.anchors = _data(8, seed=3)[0]
        m.anchors_Y = _data(8, seed=3)[1]
        preds, ue = m(x, return_ue=True)
        assert np.asarray(ue).shape == (32, 1)
        assert np.all(np.asarray(ue) >= 0)


# ---------------------------------------------------------------------------
# anchor-axis memory grouping: grouped scan == single vmap
# ---------------------------------------------------------------------------
class TestAnchoredEvalGrouping:
    """ΔUQ/PAGER bound the (anchors × batch × width) eval intermediates by
    chunking (delta_uq.anchor_rows_budget) — the reference's external
    package loops anchors one-at-a-time instead, so big
    ``num_anchors × anchored_batch_size`` combos OOM'd here before this
    (observed live at num_anchors=500 × batch=131072: a 13.3 GB HLO
    temp).  Grouped results must match the one-shot vmap exactly."""

    def test_delta_uq_grouped_matches(self):
        x, y = _data(48)
        m = DeltaUQMLPModelBuilder(
            DESCR, {'estimator': 'std', 'num_anchors': 10}).build()
        m.anchors = np.random.default_rng(1).normal(size=(10, 4)).astype(
            np.float32)
        mean_a, std_a = m(x, return_ue=True)
        m.anchor_rows_budget = 3 * 48          # force groups of 3 anchors
        m.invalidate_cache()
        mean_b, std_b = m(x, return_ue=True)
        np.testing.assert_allclose(np.asarray(mean_a), np.asarray(mean_b),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(std_a), np.asarray(std_b),
                                   rtol=1e-4, atol=1e-6)

    def test_delta_uq_grouped_var_matches(self):
        x, y = _data(48)
        m = DeltaUQMLPModelBuilder(
            DESCR, {'estimator': 'var', 'num_anchors': 7}).build()
        m.anchors = np.random.default_rng(1).normal(size=(7, 4)).astype(
            np.float32)
        _, var_a = m(x, return_ue=True)
        m.anchor_rows_budget = 2 * 48
        m.invalidate_cache()
        _, var_b = m(x, return_ue=True)
        np.testing.assert_allclose(np.asarray(var_a), np.asarray(var_b),
                                   rtol=1e-4, atol=1e-6)

    def test_delta_uq_bf16_mixed_eval_tracks_f32(self):
        """bf16-mixed anchored eval (the round-4 option for the delta_uq
        cell's 19 PFLOP/trial protocol cost) runs the anchored GEMMs in
        bf16 but must accumulate anchor statistics in f32 and return the
        input dtype, tracking the f32 path within mixed tolerance on
        both the one-shot and the grouped scan path."""
        x, y = _data(48)
        m = DeltaUQMLPModelBuilder(
            DESCR, {'estimator': 'std', 'num_anchors': 10}).build()
        m.anchors = np.random.default_rng(1).normal(size=(10, 4)).astype(
            np.float32)
        mean32, std32 = (np.asarray(v) for v in m(x, return_ue=True))
        m.set_precision('bf16-mixed')
        m.invalidate_cache()
        mean16, std16 = m(x, return_ue=True)
        assert np.asarray(mean16).dtype == np.float32
        assert np.asarray(std16).dtype == np.float32
        np.testing.assert_allclose(np.asarray(mean16), mean32,
                                   rtol=0.05, atol=0.05)
        np.testing.assert_allclose(np.asarray(std16), std32,
                                   rtol=0.25, atol=0.05)
        m.anchor_rows_budget = 3 * 48          # grouped scan path
        m.invalidate_cache()
        mean16g, std16g = m(x, return_ue=True)
        np.testing.assert_allclose(np.asarray(mean16g), np.asarray(mean16),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(std16g), np.asarray(std16),
                                   rtol=1e-3, atol=1e-5)

    def test_pager_grouped_matches(self):
        x, y = _data(40)
        m = PAGERModelBuilder(
            DESCR, {'estimator': 'std', 'num_anchors': 6}).build()
        rng = np.random.default_rng(2)
        m.anchors = rng.normal(size=(6, 4)).astype(np.float32)
        m.anchors_Y = rng.normal(size=(6, 1)).astype(np.float32)
        _, ue_a = m(x, return_ue=True)
        m.anchor_rows_budget = 6 * 5           # groups of 5 test samples
        m.invalidate_cache()
        _, ue_b = m(x, return_ue=True)
        np.testing.assert_allclose(np.asarray(ue_a), np.asarray(ue_b),
                                   rtol=1e-5, atol=1e-6)

    def test_grouped_large_mean_stable(self):
        """Outputs with mean ~1e4 and tiny anchored spread: a raw
        Σp²−n·mean² accumulation cancels catastrophically in f32; the
        Chan-combine grouped path must match the two-pass vmap closely."""
        x, _ = _data(48)
        m = DeltaUQMLPModelBuilder(
            DESCR, {'estimator': 'std', 'num_anchors': 9}).build()
        params = list(m.params)
        last = dict(params[-1])
        last['b'] = last['b'] + 1e4
        params[-1] = last
        m.params = tuple(params)
        m.anchors = np.random.default_rng(3).normal(size=(9, 4)).astype(
            np.float32)
        mean_a, std_a = m(x, return_ue=True)
        m.anchor_rows_budget = 2 * 48
        m.invalidate_cache()
        mean_b, std_b = m(x, return_ue=True)
        assert float(np.mean(np.asarray(mean_a))) > 1e3
        np.testing.assert_allclose(np.asarray(std_a), np.asarray(std_b),
                                   rtol=2e-2, atol=1e-4)

    def test_grouped_short_anchor_buffer(self):
        """Fewer stored anchors than num_anchors must not break the
        grouped reshape (the vmap path always tolerated short buffers)."""
        x, _ = _data(32)
        m = DeltaUQMLPModelBuilder(
            DESCR, {'estimator': 'std', 'num_anchors': 50}).build()
        m.anchors = np.random.default_rng(1).normal(size=(7, 4)).astype(
            np.float32)
        mean_a, std_a = m(x, return_ue=True)
        m.anchor_rows_budget = 2 * 32
        m.invalidate_cache()
        mean_b, std_b = m(x, return_ue=True)
        np.testing.assert_allclose(np.asarray(std_a), np.asarray(std_b),
                                   rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# validation-anchor cap: val loss uses min(num_anchors, val_num_anchors)
# anchors; the UE/eval path always uses the full num_anchors
# ---------------------------------------------------------------------------
class TestValNumAnchorsCap:
    def _model(self, **duq):
        m = DeltaUQMLPModelBuilder(
            DESCR, {'estimator': 'std', 'num_anchors': 12, **duq}).build()
        m.anchors = np.random.default_rng(5).normal(size=(12, 4)).astype(
            np.float32)
        return m

    def test_val_loss_uses_capped_anchors(self):
        x, y = _data(32)
        m = self._model(val_num_anchors=3)
        vl_capped = float(m.validation_loss(m.params, m.state, (x, y), None))
        # manual: anchored mean over the FIRST 3 stored anchors only
        mean3, _ = m._anchored_stats(m.params, m.state, jnp.asarray(x),
                                     m.anchors, 3)
        manual = float(jnp.mean(jnp.abs(mean3 - y)))
        assert vl_capped == pytest.approx(manual, rel=1e-6)
        # differs from the full-anchor validation loss
        m_full = self._model(val_num_anchors=None)
        m_full.params, m_full.state = m.params, m.state
        vl_full = float(m_full.validation_loss(m_full.params, m_full.state,
                                               (x, y), None))
        mean12, _ = m._anchored_stats(m.params, m.state, jnp.asarray(x),
                                      m.anchors, 12)
        assert vl_full == pytest.approx(
            float(jnp.mean(jnp.abs(mean12 - y))), rel=1e-6)
        assert vl_capped != pytest.approx(vl_full, rel=1e-9)

    def test_eval_path_unaffected_by_cap(self):
        """The UE pass (timed eval / metrics) must use the full
        num_anchors regardless of val_num_anchors."""
        x, _ = _data(24)
        m_cap = self._model(val_num_anchors=2)
        m_ref = self._model(val_num_anchors=None)
        m_ref.params, m_ref.state = m_cap.params, m_cap.state
        m_ref.anchors = m_cap.anchors
        pa, ua = m_cap(x, return_ue=True)
        pb, ub = m_ref(x, return_ue=True)
        np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    def test_no_anchors_fallback_still_doubles(self):
        x, y = _data(16)
        m = DeltaUQMLPModelBuilder(
            DESCR, {'estimator': 'std', 'num_anchors': 4,
                    'val_num_anchors': 2}).build()
        vl = m.validation_loss(m.params, m.state, (x, y), None)
        assert np.isfinite(float(vl))

    def test_default_cap_and_checkpoint_roundtrip(self):
        m = self._model()
        assert m.val_num_anchors == m.DEFAULT_VAL_NUM_ANCHORS
        d = m.config_dict()
        assert d['val_num_anchors'] == m.DEFAULT_VAL_NUM_ANCHORS
        m2 = self._model(val_num_anchors=None)
        assert m2.val_num_anchors is None
        assert m2.config_dict()['val_num_anchors'] is None


# ---------------------------------------------------------------------------
# anchored_batch_size: a memory bound enforced INSIDE the compiled program
# (observed live: host-chunking a 16.7M-row pass by 229 rows = ~73k tunnel
# dispatches = ~40 min/pass; see DeltaUQMLP._rows_budget)
# ---------------------------------------------------------------------------
class TestAnchoredBatchSizeBudget:
    def test_rows_budget_arithmetic(self):
        m = DeltaUQMLPModelBuilder(
            DESCR, {'num_anchors': 229, 'anchored_batch_size': 229}).build()
        assert m._rows_budget() == max(229 * 229, m.MIN_ROWS_BUDGET)
        m2 = DeltaUQMLPModelBuilder(
            DESCR, {'num_anchors': 500,
                    'anchored_batch_size': 131072}).build()
        assert m2._rows_budget() == m2.anchor_rows_budget   # capped above
        m3 = DeltaUQMLPModelBuilder(DESCR, {'num_anchors': 10}).build()
        assert m3._rows_budget() == m3.anchor_rows_budget   # unset -> full

    def test_results_identical_across_anchored_batch_size(self):
        x, _ = _data(96)
        base = DeltaUQMLPModelBuilder(
            DESCR, {'estimator': 'std', 'num_anchors': 12}).build()
        anchors = np.random.default_rng(9).normal(size=(12, 4)).astype(
            np.float32)
        base.anchors = anchors
        ref_mean, ref_std = base(x, return_ue=True)
        for abs_ in (64, 229, 131072):
            m = DeltaUQMLPModelBuilder(
                DESCR, {'estimator': 'std', 'num_anchors': 12,
                        'anchored_batch_size': abs_}).build()
            m.params, m.state = base.params, base.state
            m.anchors = anchors
            mean, std = m(x, return_ue=True)
            np.testing.assert_allclose(np.asarray(mean),
                                       np.asarray(ref_mean),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(std), np.asarray(ref_std),
                                       rtol=1e-4, atol=1e-6)

    def test_pager_budget_respected(self):
        x, _ = _data(40)
        rng = np.random.default_rng(2)
        base = PAGERModelBuilder(
            DESCR, {'estimator': 'std', 'num_anchors': 6}).build()
        base.anchors = rng.normal(size=(6, 4)).astype(np.float32)
        base.anchors_Y = rng.normal(size=(6, 1)).astype(np.float32)
        _, ue_ref = base(x, return_ue=True)
        m = PAGERModelBuilder(
            DESCR, {'estimator': 'std', 'num_anchors': 6,
                    'anchored_batch_size': 64}).build()
        m.params, m.state = base.params, base.state
        m.anchors = base.anchors
        m.anchors_Y = base.anchors_Y
        _, ue = m(x, return_ue=True)
        np.testing.assert_allclose(np.asarray(ue), np.asarray(ue_ref),
                                   rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# mc_dropout: prng_impl knob (config-visible sampling-stream family)
# ---------------------------------------------------------------------------
class TestMCDropoutPrngImpl:
    """``uq_config.mc_dropout.prng_impl`` selects the MC sampling stream:
    the default ``rbg`` is hardware-fast but cross-backend-unstable;
    ``threefry2x32`` is the fully-specified stream, pinned here against
    CPU-generated goldens so any backend must reproduce it (the fused
    on-chip-PRNG kernel is disabled under threefry for the same reason).
    Mirrors the ``knn_exact`` config-knob treatment (models/kde.py);
    reference RNG contract: torch global RNG, reference
    ``models.py:124-179``."""

    DESCR3 = [{'Linear': {'args': [4, 32]}}, {'ReLU': {}},
              {'Linear': {'args': [32, 32]}}, {'ReLU': {}},
              {'Linear': {'args': [32, 1]}}]

    def _model(self, **descr_extra):
        from nnueehcs_tpu.model_builder import MCDropoutModelBuilder
        descr = {'num_samples': 8, 'dropout_percent': 0.2, **descr_extra}
        m = MCDropoutModelBuilder(self.DESCR3, descr,
                                  train_config={'loss': 'l1_loss'}).build()
        m.init(jax.random.PRNGKey(0), (4,))
        return m

    def test_default_is_rbg(self, monkeypatch):
        monkeypatch.delenv('NNUEEHCS_TPU_PRNG_IMPL', raising=False)
        assert self._model().prng_impl == 'rbg'

    def test_config_knob(self, monkeypatch):
        monkeypatch.delenv('NNUEEHCS_TPU_PRNG_IMPL', raising=False)
        assert self._model(
            prng_impl='threefry2x32').prng_impl == 'threefry2x32'

    def test_env_overrides_config(self, monkeypatch):
        monkeypatch.setenv('NNUEEHCS_TPU_PRNG_IMPL', 'threefry2x32')
        assert self._model(prng_impl='rbg').prng_impl == 'threefry2x32'

    def test_threefry_stream_pinned_cross_backend(self, monkeypatch):
        """Golden values generated on the CPU backend; the fully-specified
        threefry2x32 stream must reproduce them on every backend."""
        monkeypatch.delenv('NNUEEHCS_TPU_PRNG_IMPL', raising=False)
        m = self._model(prng_impl='threefry2x32')
        rng = np.random.default_rng(0)
        x = rng.normal(size=(16, 4)).astype(np.float32)
        m.reseed(123)
        pred, ue = m(x, return_ue=True)
        np.testing.assert_allclose(
            np.asarray(pred)[:4, 0],
            [0.03038649, -0.05297431, 0.05848914, -0.04400704], rtol=1e-5,
            atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(ue)[:4, 0],
            [0.03213396, 0.05692177, 0.04686226, 0.04667858], rtol=1e-5,
            atol=1e-7)
        np.testing.assert_allclose(float(np.asarray(pred).sum()),
                                   -0.43120483, rtol=1e-5)
        np.testing.assert_allclose(float(np.asarray(ue).sum()),
                                   0.75511718, rtol=1e-5)
        # reseed restores the exact stream
        m.reseed(123)
        p2, u2 = m(x, return_ue=True)
        assert np.array_equal(np.asarray(pred), np.asarray(p2))
        assert np.array_equal(np.asarray(ue), np.asarray(u2))

    def test_checkpoint_roundtrip_preserves_impl(self, tmp_path,
                                                 monkeypatch):
        monkeypatch.delenv('NNUEEHCS_TPU_PRNG_IMPL', raising=False)
        from nnueehcs_tpu.training.checkpoint import save_model, load_model
        m = self._model(prng_impl='threefry2x32')
        save_model(m, str(tmp_path / 'model.pth'))
        m2 = load_model(str(tmp_path / 'model.pth'))
        assert m2.prng_impl == 'threefry2x32'

    def test_threefry_disables_fused_kernel(self, monkeypatch):
        """The fused kernel's on-chip PRNG is a different stream; a pinned
        threefry2x32 contract must keep it off."""
        monkeypatch.delenv('NNUEEHCS_TPU_PRNG_IMPL', raising=False)
        m = self._model(prng_impl='threefry2x32')
        monkeypatch.setattr(type(m), '_use_fused_eval', lambda self: True)
        x = np.zeros((4, 4), np.float32)
        m(x, return_ue=True)
        assert m._fused_active is False
