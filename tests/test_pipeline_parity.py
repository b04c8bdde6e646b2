"""Composed-pipeline numerics A/B against the reference stack.

Trains one seed-pinned small model per UQ method with THIS framework's
Trainer, exports the trained weights into the reference's torch model
classes (reference ``nnueehcs/models.py``), then runs BOTH evaluation
stacks — the reference's ``nnueehcs.evaluation.get_evaluator`` metric row
(torch forward) vs ours (jax forward) — over the same ID/OOD data and
asserts every metric in the row matches.

The reference's ``models.py`` imports three packages unavailable in this
environment: ``pytorch_lightning`` (not installed) and the external LLNL
``deltauq`` and ``kde`` packages (private; the reference's behaviour was
reconstructed from its call sites — SURVEY §2, reference
``models.py:288-473``).  They are shimmed in :func:`_reference_models`:
pytorch-lightning minimally (``LightningModule`` → ``nn.Module``), and
deltauq/kde as direct torch/numpy implementations of the documented
semantics.  Consequently:

- **ensemble, kde**: fully independent A/B — torch ``nn.Sequential``
  forward + sklearn ``KernelDensity`` on one side, jax ``Network`` +
  XLA/Pallas KDE on the other.
- **delta_uq, pager, knn_kde**: the torch side embeds the reconstructed
  external-package math, so the A/B proves the composed pipeline
  (trained weights → torch forward → UE → metric row) rather than the
  unobtainable external packages themselves.
- **mc_dropout**: the UE is inherently stochastic and the torch/jax RNG
  streams cannot be aligned; its row is compared at distribution level
  with documented loose tolerances.

Runtime/throughput/memory metrics are excluded from the row — they
measure hardware, not numerics (covered by ``test_evaluation.py``).

Tolerances: 1e-5 relative (BASELINE.md north-star target) unless a
looser documented tolerance is stated inline (f32 accumulation-order
differences between XLA and torch/sklearn kernels).
"""
import sys
import types

import numpy as np
import pytest

REF_PATH = '/root/reference'

NS = {'np': np}


def _reference_models():
    """Import the reference's models.py behind pl/deltauq/kde shims.
    Returns the module or None when torch/the checkout are unavailable."""
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    try:
        import torch
        import torch.nn as tnn
    except Exception:
        return None

    if 'pytorch_lightning' not in sys.modules:
        pl = types.ModuleType('pytorch_lightning')

        class LightningModule(tnn.Module):
            def log(self, *a, **k):
                pass

        cbs = types.ModuleType('pytorch_lightning.callbacks')

        class Callback:
            pass

        cbs.Callback = Callback
        pl.LightningModule = LightningModule
        pl.callbacks = cbs
        sys.modules['pytorch_lightning'] = pl
        sys.modules['pytorch_lightning.callbacks'] = cbs

    if 'deltauq' not in sys.modules:
        duq = types.ModuleType('deltauq')

        class deltaUQ_MLP(tnn.Module):
            """Anchoring semantics per the reference call sites
            (reference models.py:306-341): anchored input is
            concat([anchor, x - anchor]); eval runs n_anchors passes
            against stored anchors and returns (mean, unbiased std)."""

            def __init__(self, base_model, estimator='std'):
                tnn.Module.__init__(self)
                self.net = base_model
                self.estimator = estimator

            def forward(self, x, anchors=None, n_anchors=1,
                        return_std=False, return_pred_matrix=False):
                if anchors is None:
                    b = x.shape[0]
                    a1 = x[torch.randperm(b)]
                    a2 = x[torch.randperm(b)]
                    doubled = torch.cat(
                        [torch.cat([a1, x - a1], dim=-1),
                         torch.cat([a2, x - a2], dim=-1)], dim=0)
                    return self.net(doubled)
                preds = []
                for i in range(n_anchors):
                    a = anchors[i:i + 1].expand(x.shape[0], -1)
                    preds.append(self.net(torch.cat([a, x - a], dim=-1)))
                preds = torch.stack(preds)          # (n, B, out)
                if return_pred_matrix:
                    return preds
                mean = preds.mean(0)
                if return_std:
                    spread = preds.std(0) if self.estimator == 'std' \
                        else preds.var(0)
                    return mean, spread
                return mean

        duq.deltaUQ_MLP = deltaUQ_MLP
        duq.deltaUQ_CNN = deltaUQ_MLP
        sys.modules['deltauq'] = duq

    if 'kde' not in sys.modules:
        kmod = types.ModuleType('kde')

        class KNNKDE:
            """Gaussian-kernel density truncated to the k nearest
            references, normalised by the full corpus size (the semantics
            reconstructed in nnueehcs_tpu/ops/kde.py:295-302) — exact
            numpy k-NN here."""

            def __init__(self, k=10, bandwidth='scott'):
                self.k = k
                self.bandwidth = bandwidth
                self.data = None

            def fit(self, data):
                self.data = np.asarray(
                    data.detach().cpu() if hasattr(data, 'detach') else data,
                    np.float32)
                n, d = self.data.shape
                if self.bandwidth == 'scott':
                    self.h = float(n) ** (-1.0 / (d + 4))
                elif self.bandwidth == 'silverman':
                    self.h = (n * (d + 2) / 4.0) ** (-1.0 / (d + 4))
                else:
                    self.h = float(self.bandwidth)

            def kernel_density(self, x):
                xn = np.asarray(
                    x.detach().cpu() if hasattr(x, 'detach') else x,
                    np.float32)
                n, d = self.data.shape
                d2 = (np.sum(xn * xn, 1)[:, None]
                      + np.sum(self.data * self.data, 1)[None, :]
                      - 2.0 * xn @ self.data.T)
                k = min(self.k, n)
                part = np.partition(d2, k - 1, axis=1)[:, :k]
                gamma = 1.0 / (2.0 * self.h * self.h)
                expnt = -part.astype(np.float64) * gamma
                m = expnt.max(axis=1)
                lse = m + np.log(np.sum(np.exp(expnt - m[:, None]), axis=1))
                log_norm = (-np.log(n) - d * np.log(self.h)
                            - 0.5 * d * np.log(2 * np.pi))
                dens = np.exp(lse + log_norm)
                return torch.tensor(dens, dtype=torch.float32)

        kmod.KNNKDE = KNNKDE
        sys.modules['kde'] = kmod

    try:
        import nnueehcs.models as ref_models
        import nnueehcs.evaluation as ref_ev  # noqa: F401
        return ref_models
    except Exception:
        return None


REF_MODELS = _reference_models()
pytestmark = pytest.mark.skipif(
    REF_MODELS is None, reason='reference checkout/torch not importable')

# --------------------------------------------------------------------------
# shared fixtures: data, architecture, our-side training
# --------------------------------------------------------------------------
ARCH = [{'Linear': {'args': [4, 24]}},
        {'BatchNorm1d': {'args': [24]}},
        {'ReLU': {'inplace': True}},
        {'Linear': {'args': [24, 24]}},
        {'BatchNorm1d': {'args': [24]}},
        {'ReLU': {'inplace': True}},
        {'Linear': {'args': [24, 1]}}]

# the metric row of the generated configs (config_full.yaml 'evaluation:'),
# minus the hardware-timing metrics, plus the BO objective percentile_score
METRIC_CONFIG = [
    {'name': 'tnr_at_tpr', 'target_tpr': 0.95, 'reversed': False},
    {'name': 'percentile_classification', 'threshold': 0.9, 'reversed': False},
    {'name': 'percentile_classification', 'threshold': 0.9, 'reversed': True},
    {'name': 'percentile_classification', 'threshold': 0.8, 'reversed': True},
    {'name': 'percentile_classification', 'threshold': 0.8, 'reversed': False},
    {'name': 'auroc'},
    {'name': 'wasserstein'},
    {'name': 'percentile_score', 'percentile': 95},
]


def _datasets():
    rng = np.random.default_rng(42)
    xid = rng.normal(size=(1200, 4)).astype(np.float32)
    yid = np.sum(np.sin(xid), axis=1, keepdims=True).astype(np.float32)
    xood = rng.normal(loc=2.0, size=(900, 4)).astype(np.float32)
    yood = np.sum(np.sin(xood), axis=1, keepdims=True).astype(np.float32)
    return (xid, yid), (xood, yood)


def _train(model, x, y, epochs=4, tmp_path='/tmp'):
    from nnueehcs_tpu.training import Trainer, DataLoader, ArrayDataset
    tr = Trainer('parity', {'accelerator': 'cpu', 'max_epochs': epochs},
                 callbacks=model.get_callbacks(), log_dir=str(tmp_path))
    tr.fit(model, DataLoader(ArrayDataset(x, y), batch_size=128))
    return model


# --------------------------------------------------------------------------
# weight export: our (params, state) pytree -> torch nn.Sequential
# --------------------------------------------------------------------------
def _torch_sequential(architecture):
    import torch.nn as tnn
    mods = []
    for spec in architecture:
        (name, kw), = spec.items()
        kw = kw or {}
        args = kw.get('args', [])
        if name == 'Linear':
            mods.append(tnn.Linear(*args))
        elif name == 'BatchNorm1d':
            mods.append(tnn.BatchNorm1d(*args))
        elif name == 'ReLU':
            mods.append(tnn.ReLU())
        elif name == 'Dropout':
            mods.append(tnn.Dropout(*args) if args else tnn.Dropout())
        else:
            raise ValueError(f'unhandled layer {name} in export')
    return tnn.Sequential(*mods)


def _export_weights(architecture, params, state):
    """Build a torch Sequential carrying exactly our trained weights.
    Our Linear stores w as (in, out) — torch is (out, in)."""
    import torch
    import torch.nn as tnn
    seq = _torch_sequential(architecture)
    with torch.no_grad():
        for mod, p, s in zip(seq, params, state):
            if isinstance(mod, tnn.Linear):
                mod.weight.copy_(torch.tensor(np.asarray(p['w']).T))
                mod.bias.copy_(torch.tensor(np.asarray(p['b'])))
            elif isinstance(mod, tnn.BatchNorm1d):
                mod.weight.copy_(torch.tensor(np.asarray(p['scale'])))
                mod.bias.copy_(torch.tensor(np.asarray(p['bias'])))
                mod.running_mean.copy_(torch.tensor(np.asarray(s['mean'])))
                mod.running_var.copy_(torch.tensor(np.asarray(s['var'])))
    return seq


def _rows(our_model, ref_model):
    """The full metric row from both evaluation stacks."""
    import torch
    import nnueehcs.evaluation as ref_ev
    import nnueehcs_tpu.evaluation as our_ev
    (xid, yid), (xood, yood) = _datasets()

    ours = our_ev.get_evaluator(METRIC_CONFIG).evaluate(
        our_model, (xid, yid), (xood, yood))

    t = lambda a: torch.tensor(a)
    with torch.no_grad():
        ref = ref_ev.get_evaluator(METRIC_CONFIG).evaluate(
            ref_model, (t(xid), t(yid)), (t(xood), t(yood)))
    return ours, ref


def _assert_row_matches(ours, ref, rel=1e-5, abs_tol=1e-6, loose=()):
    assert set(ref).issubset(set(ours)), (set(ref) - set(ours))
    for k, v in ref.items():
        tol = dict(loose).get(k, rel)
        assert ours[k] == pytest.approx(v, rel=tol, abs=abs_tol), \
            (k, ours[k], v)


# --------------------------------------------------------------------------
# the per-method composed A/B cases
# --------------------------------------------------------------------------
class TestComposedPipelineParity:
    def test_ensemble_row(self, tmp_path):
        from nnueehcs_tpu.model_builder import EnsembleModelBuilder
        (xid, yid), _ = _datasets()
        m = EnsembleModelBuilder(
            ARCH, {'num_models': 4},
            train_config={'loss': 'l1_loss', 'learning_rate': 1e-3}).build()
        _train(m, xid, yid, tmp_path=tmp_path)

        import jax
        members = []
        for i in range(m.num_models):
            p_i = jax.tree_util.tree_map(lambda a: a[i], m.params)
            s_i = jax.tree_util.tree_map(lambda a: a[i], m.state)
            members.append(_export_weights(m.net.architecture, p_i, s_i))
        ref_m = REF_MODELS.EnsembleModel(members).eval()

        ours, ref = _rows(m, ref_m)
        # W1 of the UE distributions amplifies the f32-vs-f64 forward
        # difference near percentile boundaries — documented 1e-4
        _assert_row_matches(ours, ref, loose=[('wasserstein', 1e-4)])

    def test_kde_row(self, tmp_path):
        from nnueehcs_tpu.model_builder import KDEModelBuilder
        (xid, yid), _ = _datasets()
        # rtol=1.0 -> sklearn rtol 1e-4: near-exact tree so the sklearn
        # approximation itself stays below the comparison tolerance
        m = KDEModelBuilder(
            ARCH, {'bandwidth': 'scott', 'rtol': 1.0},
            train_config={'loss': 'l1_loss', 'learning_rate': 1e-3}).build()
        _train(m, xid, yid, tmp_path=tmp_path)
        assert m.kde is not None, 'KDE fit hook did not run'

        import torch
        seq = _export_weights(m.net.architecture, m.params, m.state)
        ref_m = REF_MODELS.KDEMLPModel(seq, bandwidth='scott',
                                       rtol=1.0, train_fit_prop=1.0).eval()
        ref_m.fit_kde(torch.tensor(np.asarray(m.kde.data)))

        ours, ref = _rows(m, ref_m)
        # densities pass through exp(); sklearn evaluates in f64 vs our
        # f32 logsumexp — documented 1e-4 on the density-derived metrics
        _assert_row_matches(ours, ref, rel=1e-4,
                            loose=[('wasserstein', 1e-3),
                                   ('percentile_score', 1e-3)])

    def test_knn_kde_row(self, tmp_path):
        from nnueehcs_tpu.model_builder import KNNKDEModelBuilder
        (xid, yid), _ = _datasets()
        m = KNNKDEModelBuilder(
            ARCH, {'bandwidth': 'scott', 'k': 25},
            train_config={'loss': 'l1_loss', 'learning_rate': 1e-3}).build()
        _train(m, xid, yid, tmp_path=tmp_path)
        assert m._fit_data is not None, 'kNN-KDE fit hook did not run'

        import torch
        seq = _export_weights(m.net.architecture, m.params, m.state)
        ref_m = REF_MODELS.KNNKDEMLPModel(seq, bandwidth='scott',
                                          k=25).eval()
        ref_m.fit_kde(torch.tensor(np.asarray(m._fit_data)))

        ours, ref = _rows(m, ref_m)
        _assert_row_matches(ours, ref, rel=1e-4,
                            loose=[('wasserstein', 1e-3),
                                   ('percentile_score', 1e-3)])

    def test_delta_uq_row(self, tmp_path):
        from nnueehcs_tpu.model_builder import DeltaUQMLPModelBuilder
        (xid, yid), _ = _datasets()
        m = DeltaUQMLPModelBuilder(
            ARCH, {'estimator': 'std', 'num_anchors': 6},
            train_config={'loss': 'l1_loss', 'learning_rate': 1e-3}).build()
        _train(m, xid, yid, tmp_path=tmp_path)
        assert m.anchors is not None, 'anchor hook did not run'

        import torch
        seq = _export_weights(m.net.architecture, m.params, m.state)
        ref_m = REF_MODELS.DeltaUQMLP(seq, estimator='std',
                                      num_anchors=6).eval()
        ref_m.anchors = torch.tensor(np.asarray(m.anchors))

        ours, ref = _rows(m, ref_m)
        _assert_row_matches(ours, ref, loose=[('wasserstein', 1e-4)])

    def test_pager_row(self, tmp_path):
        from nnueehcs_tpu.model_builder import PAGERModelBuilder
        (xid, yid), _ = _datasets()
        m = PAGERModelBuilder(
            ARCH, {'estimator': 'std', 'num_anchors': 6},
            train_config={'loss': 'l1_loss', 'learning_rate': 1e-3}).build()
        _train(m, xid, yid, tmp_path=tmp_path)
        assert m.anchors is not None and m.anchors_Y is not None

        import torch
        seq = _export_weights(m.net.architecture, m.params, m.state)
        ref_m = REF_MODELS.PAGERMLP(seq, estimator='std',
                                    num_anchors=6).eval()
        ref_m.anchors = torch.tensor(np.asarray(m.anchors))
        ref_m.anchors_Y = torch.tensor(np.asarray(m.anchors_Y))

        ours, ref = _rows(m, ref_m)
        _assert_row_matches(ours, ref, loose=[('wasserstein', 1e-4)])

    def test_mc_dropout_row_statistical(self, tmp_path):
        """mc_dropout's UE depends on the dropout RNG; torch and jax
        streams cannot be aligned, so the rows are compared at
        distribution level: rank metrics within 0.03 absolute, score
        percentiles within 10% relative — far tighter than the spread
        across BO trial parameterisations these metrics discriminate."""
        import torch
        from nnueehcs_tpu.model_builder import MCDropoutModelBuilder
        (xid, yid), _ = _datasets()
        m = MCDropoutModelBuilder(
            ARCH, {'num_samples': 48, 'dropout_percent': 0.1},
            train_config={'loss': 'l1_loss', 'learning_rate': 1e-3}).build()
        _train(m, xid, yid, tmp_path=tmp_path)

        seq = _export_weights(m.net.architecture, m.params, m.state)
        torch.manual_seed(0)
        ref_m = REF_MODELS.MCDropoutModel(
            seq, num_samples=48, dropout_percent=0.1)
        ref_m.eval()

        ours, ref = _rows(m, ref_m)
        for k, v in ref.items():
            if k.startswith(('tnr', 'auroc', 'sensitivity', 'specificity',
                             'fpr', 'fnr')) or 'classification' in k:
                assert ours[k] == pytest.approx(v, abs=0.03), (k, ours[k], v)
            else:
                assert ours[k] == pytest.approx(v, rel=0.10), (k, ours[k], v)
