"""Composed-pipeline numerics A/B vs the reference stack (BASELINE.md north
star: "all UQ metrics match reference to 1e-5").

For each UQ method we train ONE seed-pinned small model through OUR stack,
export the trained weights into a plain-torch replica whose forward
implements the reference's model semantics verbatim (reference
``nnueehcs/models.py``: ensemble std-over-members 99-108, MC-dropout
repeated stochastic passes 147-163, KDE ``-exp(sklearn score_samples)``
209-223, Δ-UQ anchored mean/std, PAGER conformal max 390-434), and push the
SAME weights + SAME ID/OOD data through

  (a) our evaluation stack  (``nnueehcs_tpu.evaluation``), and
  (b) the REFERENCE's own evaluation stack (``/root/reference/nnueehcs/
      evaluation.py`` — importable; its ``MetricEvaluator`` only needs a
      torch module with ``forward(x, return_ue=True)``),

then compare the full metric row (W1, JSD, mean/percentile scores,
TNR@TPR95, AUROC, percentile classification).

The reference's *model* classes themselves are not importable in this image
(they require pytorch-lightning and the external ``deltauq``/``kde``
packages, absent by design), so the torch replicas here stand in for them;
each replica is a line-by-line transcription of the corresponding
reference ``forward`` into plain torch.  The KDE replica uses the
reference's actual scoring dependency (``sklearn.neighbors.KernelDensity``,
reference ``models.py:200-211``).

Tolerances: both stacks run f32 forward math, so score vectors agree to
~1e-6 relative; distribution metrics (W1/JSD/scores) are asserted at 1e-5
relative per BASELINE.md.  Rank-counting metrics (TNR@TPR, AUROC,
percentile classification) are step functions with steps of 1/N — a last-ulp
forward difference can flip one rank among near-ties — so they are asserted
to within 2/N (documented deviation; exact match observed in practice).
MC-dropout draws its dropout masks from different RNGs (jax vs torch) by
construction, so its row is compared statistically (5% relative) with many
samples.
"""
import sys

import numpy as np
import pytest

REF_PATH = '/root/reference'


def _reference_available():
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    try:
        import nnueehcs.evaluation  # noqa: F401
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _reference_available(),
                                reason='reference checkout not importable')

ARCH = [
    {'Linear': {'args': [4, 32]}},
    {'ReLU': {}},
    {'Linear': {'args': [32, 16]}},
    {'ReLU': {}},
    {'Linear': {'args': [16, 1]}},
]

# one full metric row: every distribution + classification metric the BO
# driver's trial_results carries (reference examples/bo_driven/config.yaml)
METRIC_CFG = [
    {'name': 'wasserstein_distance'},
    {'name': 'jensen_shannon_distance'},
    {'name': 'mean_score'},
    {'name': 'percentile_score', 'percentile': 95.0},
    {'name': 'tnr_at_tpr', 'target_tpr': 0.95},
    {'name': 'auroc'},
    {'name': 'percentile_classification', 'threshold': 0.8},
]


@pytest.fixture(autouse=True)
def _in_tmpdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)


@pytest.fixture(scope='module')
def data():
    rng = np.random.default_rng(42)
    x_id = rng.normal(size=(256, 4)).astype(np.float32)
    x_ood = rng.normal(loc=2.0, size=(256, 4)).astype(np.float32)
    y_id = x_id.sum(1, keepdims=True).astype(np.float32)
    y_ood = x_ood.sum(1, keepdims=True).astype(np.float32)
    return (x_id, y_id), (x_ood, y_ood)


def _fit(model, x, y, max_epochs=60, extra_callbacks=()):
    from nnueehcs_tpu.training import Trainer, DataLoader, ArrayDataset
    dl = DataLoader(ArrayDataset(x, y), batch_size=64)
    tr = Trainer('composed_parity',
                 {'accelerator': 'cpu', 'max_epochs': max_epochs,
                  'log_every_n_steps': 5, 'num_sanity_val_steps': 0},
                 callbacks=list(extra_callbacks) + list(model.get_callbacks()))
    tr.fit(model, dl, dl)
    return model


def _member_params(params, i):
    import jax
    return jax.tree_util.tree_map(lambda l: np.asarray(l[i]), params)


def _torch_sequential(net, params):
    """Export one member's trained params into a torch Sequential that
    mirrors the YAML architecture (our Linear stores w as (in, out);
    torch stores (out, in))."""
    import torch
    import torch.nn as tnn
    mods = []
    for layer, p in zip(net.layers, params):
        name = type(layer).__name__
        if name == 'Linear':
            m = tnn.Linear(layer.in_features, layer.out_features,
                           bias=layer.bias)
            with torch.no_grad():
                m.weight.copy_(torch.from_numpy(np.asarray(p['w']).T.copy()))
                if layer.bias:
                    m.bias.copy_(
                        torch.from_numpy(np.asarray(p['b']).copy()))
            mods.append(m)
        elif name == 'ReLU':
            mods.append(tnn.ReLU())
        elif name == 'Tanh':
            mods.append(tnn.Tanh())
        elif name == 'Dropout':
            mods.append(tnn.Dropout(layer.p))
        else:
            raise NotImplementedError(f'no torch export for layer {name}')
    return tnn.Sequential(*mods)


def _rows(our_model, torch_model, data):
    """Run the full metric row through both stacks."""
    import torch
    import nnueehcs.evaluation as ref_ev
    import nnueehcs_tpu.evaluation as our_ev

    (x_id, y_id), (x_ood, y_ood) = data
    ours = our_ev.get_uncertainty_evaluator(METRIC_CFG).evaluate(
        our_model, (x_id, y_id), (x_ood, y_ood))
    t = lambda a: torch.from_numpy(a)
    ref = ref_ev.get_uncertainty_evaluator(METRIC_CFG).evaluate(
        torch_model, (t(x_id), t(y_id)), (t(x_ood), t(y_ood)))
    return ours, ref


# metrics that are step functions of score ranks: 1/N granularity
_COUNTING = ('tnr_at_tpr95', 'auroc', 'sensitivity', 'specificity',
             'fpr', 'fnr')


def _assert_row_parity(ours, ref, n, rel=1e-5, counting_steps=2):
    assert set(ref).issubset(set(ours)), (set(ref) - set(ours))
    for k, ref_v in ref.items():
        our_v = ours[k]
        ref_a = np.asarray(
            ref_v.numpy() if hasattr(ref_v, 'numpy') else ref_v)
        if ref_a.ndim > 0:
            # array-valued row entries (raw score/pred vectors carried in
            # the row): elementwise f32 parity
            np.testing.assert_allclose(np.asarray(our_v, dtype=np.float64),
                                       ref_a.astype(np.float64),
                                       rtol=1e-4, atol=1e-6, err_msg=k)
        elif any(k.startswith(c) for c in _COUNTING):
            assert abs(our_v - ref_v) <= counting_steps / n + 1e-12, \
                (k, our_v, ref_v)
        else:
            assert our_v == pytest.approx(ref_v, rel=rel, abs=1e-9), \
                (k, our_v, ref_v)


def _assert_scores_match(our_model, torch_model, x, atol=1e-4):
    import torch
    _, our_ue = our_model(x, return_ue=True)
    with torch.no_grad():
        _, ref_ue = torch_model(torch.from_numpy(x), return_ue=True)
    np.testing.assert_allclose(np.asarray(our_ue).ravel(),
                               ref_ue.numpy().ravel(),
                               rtol=1e-4, atol=atol)


# --------------------------------------------------------------- ensemble
def test_composed_row_parity_ensemble(data):
    import torch
    import torch.nn as tnn
    from nnueehcs_tpu.model_builder import EnsembleModelBuilder

    (x_id, y_id), _ = data
    model = EnsembleModelBuilder(ARCH, {'num_models': 4},
                                 train_config={'loss': 'l1_loss'}).build()
    _fit(model, x_id, y_id)

    class TorchEnsemble(tnn.Module):
        # reference models.py:99-108: stack member outputs; UE = std(0)
        def __init__(self, members):
            super().__init__()
            self.members = tnn.ModuleList(members)

        def forward(self, x, return_ue=False):
            outputs = torch.stack([m(x) for m in self.members])
            if return_ue:
                return outputs.mean(0), outputs.std(0)
            return outputs.mean(0)

    members = [_torch_sequential(model.net, _member_params(model.params, i))
               for i in range(model.num_models)]
    replica = TorchEnsemble(members).eval()

    _assert_scores_match(model, replica, data[0][0])
    ours, ref = _rows(model, replica, data)
    _assert_row_parity(ours, ref, n=len(data[0][0]))


# -------------------------------------------------------------------- mve
def test_composed_row_parity_mve(data):
    import torch
    import torch.nn as tnn
    from nnueehcs_tpu.model_builder import MVEModelBuilder

    (x_id, y_id), _ = data
    arch = ARCH[:-1] + [{'Linear': {'args': [16, 2]}}]
    model = MVEModelBuilder(arch, train_config={'loss': 'l1_loss'}).build()
    _fit(model, x_id, y_id)

    class TorchMVE(tnn.Module):
        # our models/mve.py semantics (an addition beyond the reference's
        # six methods): mu = out[:, :1], sigma = sqrt(softplus(out[:,1:])+eps)
        def __init__(self, net):
            super().__init__()
            self.net = net

        def forward(self, x, return_ue=False):
            out = self.net(x)
            mu = out[..., 0:1]
            if not return_ue:
                return mu
            sigma = torch.sqrt(tnn.functional.softplus(out[..., 1:2]) + 1e-6)
            return mu, sigma

    replica = TorchMVE(_torch_sequential(model.net, model.params)).eval()
    _assert_scores_match(model, replica, data[0][0])
    ours, ref = _rows(model, replica, data)
    _assert_row_parity(ours, ref, n=len(data[0][0]))


# -------------------------------------------------------------------- kde
def test_composed_row_parity_kde(data):
    import torch
    import torch.nn as tnn
    from nnueehcs_tpu.model_builder import KDEModelBuilder

    (x_id, y_id), _ = data
    model = KDEModelBuilder(ARCH, {'rtol': 0.1},
                            train_config={'loss': 'l1_loss'}).build()
    _fit(model, x_id, y_id)

    class TorchKDE(tnn.Module):
        # reference models.py:191-223: sklearn KernelDensity (the
        # reference's actual scoring backend), UE = -exp(score_samples)
        def __init__(self, net, fit_data, bandwidth, rtol):
            super().__init__()
            from sklearn.neighbors import KernelDensity
            self.net = net
            self.kde = KernelDensity(bandwidth=bandwidth, rtol=rtol)
            self.kde.fit(fit_data)

        def forward(self, x, return_ue=False):
            pred = self.net(x)
            if not return_ue:
                return pred
            log_dens = self.kde.score_samples(x.detach().cpu().numpy())
            return pred, -torch.exp(torch.from_numpy(log_dens))

    fit_corpus = np.asarray(model.kde.data)
    replica = TorchKDE(_torch_sequential(model.net, model.params),
                       fit_corpus, bandwidth='scott',
                       rtol=0.1 / 10000).eval()
    _assert_scores_match(model, replica, data[0][0], atol=1e-5)
    ours, ref = _rows(model, replica, data)
    _assert_row_parity(ours, ref, n=len(data[0][0]))


# ---------------------------------------------------------------- delta_uq
def _torch_duq_stats(net, anchors, x):
    """Reference Δ-UQ anchored eval: one pass per stored anchor on
    concat([anchor, x - anchor]); mean/std over the anchor axis."""
    import torch
    preds = []
    for a in anchors:
        a_b = a.unsqueeze(0).expand_as(x)
        preds.append(net(torch.cat([a_b, x - a_b], dim=-1)))
    preds = torch.stack(preds)
    return preds.mean(0), preds.std(0)


def test_composed_row_parity_delta_uq(data):
    import torch
    import torch.nn as tnn
    from nnueehcs_tpu.model_builder import DeltaUQMLPModelBuilder

    (x_id, y_id), _ = data
    model = DeltaUQMLPModelBuilder(ARCH, {'estimator': 'std',
                                          'num_anchors': 5},
                                   train_config={'loss': 'l1_loss'}).build()
    _fit(model, x_id, y_id)
    assert model.anchors is not None

    class TorchDeltaUQ(tnn.Module):
        def __init__(self, net, anchors):
            super().__init__()
            self.net = net
            self.register_buffer('anchors', anchors)

        def forward(self, x, return_ue=False):
            mean, std = _torch_duq_stats(self.net, self.anchors, x)
            return (mean, std) if return_ue else mean

    anchors = torch.from_numpy(
        np.asarray(model.anchors[:model.num_anchors]))
    replica = TorchDeltaUQ(_torch_sequential(model.net, model.params),
                           anchors).eval()
    _assert_scores_match(model, replica, data[0][0], atol=1e-5)
    ours, ref = _rows(model, replica, data)
    _assert_row_parity(ours, ref, n=len(data[0][0]))


# ------------------------------------------------------------------- pager
def test_composed_row_parity_pager(data):
    import torch
    import torch.nn as tnn
    from nnueehcs_tpu.model_builder import PAGERModelBuilder

    (x_id, y_id), _ = data
    model = PAGERModelBuilder(ARCH, {'estimator': 'std', 'num_anchors': 5},
                              train_config={'loss': 'l1_loss'}).build()
    _fit(model, x_id, y_id)
    assert model.anchors is not None and model.anchors_Y is not None

    class TorchPAGER(tnn.Module):
        # reference models.py:390-434: UE = max(duq std, conformal score);
        # conformal p_matrix[s, a] = prediction for anchor input a anchored
        # at sample s; score(s) = max_a |p_matrix[s, a] - anchors_Y[a]|
        def __init__(self, net, anchors, anchors_y):
            super().__init__()
            self.net = net
            self.register_buffer('anchors', anchors)
            self.register_buffer('anchors_y', anchors_y)

        def forward(self, x, return_ue=False):
            mean, std = _torch_duq_stats(self.net, self.anchors, x)
            if not return_ue:
                return mean
            rows = []
            for s in x:
                s_b = s.unsqueeze(0).expand_as(self.anchors)
                rows.append(self.net(
                    torch.cat([s_b, self.anchors - s_b], dim=-1))[:, 0])
            p_matrix = torch.stack(rows)                       # (B, A)
            score = torch.max(torch.abs(p_matrix - self.anchors_y.T),
                              dim=1)[0].unsqueeze(-1)
            return mean, torch.maximum(std, score)

    a = torch.from_numpy(np.asarray(model.anchors[:model.num_anchors]))
    ay = torch.from_numpy(np.asarray(model.anchors_Y[:model.num_anchors]))
    replica = TorchPAGER(_torch_sequential(model.net, model.params),
                         a, ay).eval()
    _assert_scores_match(model, replica, data[0][0], atol=1e-5)
    ours, ref = _rows(model, replica, data)
    _assert_row_parity(ours, ref, n=len(data[0][0]))


# -------------------------------------------------------------- mc_dropout
@pytest.mark.slow
def test_composed_row_parity_mc_dropout_statistical(data):
    """MC-dropout draws masks from different RNG families (jax vs torch),
    so score vectors can't match elementwise; with many samples the UE
    *distributions* converge and the metric row must agree statistically."""
    import torch
    import torch.nn as tnn
    from nnueehcs_tpu.model_builder import MCDropoutModelBuilder

    (x_id, y_id), _ = data
    model = MCDropoutModelBuilder(
        ARCH, {'num_samples': 256, 'dropout_percent': 0.2},
        train_config={'loss': 'l1_loss'}).build()
    _fit(model, x_id, y_id)

    class TorchMCD(tnn.Module):
        # reference models.py:147-169: repeated stochastic forward passes
        # with dropout active in eval; UE = std over passes
        def __init__(self, net, num_samples):
            super().__init__()
            self.net = net
            self.num_samples = num_samples

        def forward(self, x, return_ue=False):
            preds = torch.stack([self.net(x)
                                 for _ in range(self.num_samples)])
            if return_ue:
                return preds.mean(0), preds.std(0)
            return preds.mean(0)

        def eval(self):
            super().eval()
            for m in self.net.modules():
                if isinstance(m, tnn.Dropout):
                    m.train()
            return self

    torch.manual_seed(0)
    replica = TorchMCD(_torch_sequential(model.net, model.params),
                       model.num_samples).eval()
    ours, ref = _rows(model, replica, data)
    for k in ('wasserstein_distance', 'mean_score', 'percentile_score'):
        assert ours[k] == pytest.approx(ref[k], rel=0.05), (k, ours[k], ref[k])
    # rank metrics on well-separated ID/OOD populations are stable under
    # mask-resampling noise
    assert ours['auroc'] == pytest.approx(ref['auroc'], abs=0.02)
    assert ours['tnr_at_tpr95'] == pytest.approx(ref['tnr_at_tpr95'], abs=0.05)
