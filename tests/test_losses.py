"""Loss-registry parity against torch.nn.functional (the reference resolves
losses by name there — reference ``nnueehcs/models.py:52-56``)."""
import numpy as np
import pytest

from nnueehcs_tpu.ops.losses import LOSS_REGISTRY, get_loss_fn

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402


@pytest.fixture
def reg_data():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(64, 3)).astype(np.float32)
    target = rng.normal(size=(64, 3)).astype(np.float32)
    return pred, target


@pytest.mark.parametrize('name', ['l1_loss', 'mse_loss', 'smooth_l1_loss',
                                  'huber_loss'])
def test_regression_losses_match_torch(name, reg_data):
    pred, target = reg_data
    ours = float(get_loss_fn(name)(pred, target))
    ref = float(getattr(F, name)(torch.tensor(pred), torch.tensor(target)))
    assert ours == pytest.approx(ref, rel=1e-6)


def test_bce_matches_torch():
    rng = np.random.default_rng(1)
    p = rng.uniform(0.01, 0.99, size=(32, 1)).astype(np.float32)
    t = rng.integers(0, 2, size=(32, 1)).astype(np.float32)
    ours = float(get_loss_fn('binary_cross_entropy')(p, t))
    ref = float(F.binary_cross_entropy(torch.tensor(p), torch.tensor(t)))
    assert ours == pytest.approx(ref, rel=1e-5)

    logits = rng.normal(size=(32, 1)).astype(np.float32)
    ours = float(get_loss_fn('binary_cross_entropy_with_logits')(logits, t))
    ref = float(F.binary_cross_entropy_with_logits(torch.tensor(logits),
                                                   torch.tensor(t)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(32, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(32,))
    ours = float(get_loss_fn('cross_entropy')(logits, labels))
    ref = float(F.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_unknown_loss_raises():
    with pytest.raises(ValueError):
        get_loss_fn('nope')


def test_registry_complete():
    for name in LOSS_REGISTRY:
        assert callable(get_loss_fn(name))
