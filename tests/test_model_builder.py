"""Builder tests: YAML→network structure, info-grabber contracts, ΔUQ/PAGER
input doubling, MC-dropout arch rewrite (modelled on the reference's
``tests/test_model_builder.py``)."""
import numpy as np
import pytest

from nnueehcs_tpu.nn.layers import Linear, ReLU, BatchNorm1d, Dropout
from nnueehcs_tpu.nn.network import build_network
from nnueehcs_tpu.model_builder import (
    MLPModelBuilder, EnsembleModelBuilder, MCDropoutModelBuilder,
    DeltaUQMLPModelBuilder, PAGERModelBuilder, KDEModelBuilder,
    KNNKDEModelBuilder, ModelInfo)


@pytest.fixture
def descr():
    return [
        {'Linear': {'args': [16, 64]}},
        {'BatchNorm1d': {'args': [64]}},
        {'ReLU': {'inplace': True}},
        {'Linear': {'args': [64, 64]}},
        {'ReLU': {}},
        {'Linear': {'args': [64, 1]}},
    ]


def test_build_network_structure(descr):
    net = build_network(descr)
    assert len(net) == 6
    assert net.layers[0] == Linear(16, 64)
    assert net.layers[1] == BatchNorm1d(64)
    assert isinstance(net.layers[2], ReLU)
    assert net.layers[5] == Linear(64, 1)


def test_build_network_unknown_layer():
    with pytest.raises(Exception):
        build_network([{'NoSuchLayer': {'args': [1]}}])


def test_mlp_info(descr):
    info = ModelInfo.get_info_grabber(descr)
    assert info.is_mlp() and not info.is_cnn()
    assert info.num_inputs() == 16
    assert info.num_layers() == 6


def test_cnn_info():
    descr = [{'Conv2d': {'args': [3, 16, 5]}}, {'ReLU': {}}]
    info = ModelInfo.get_info_grabber(descr)
    assert info.is_cnn() and not info.is_mlp()
    assert info.num_inputs() == 3


def test_mlp_builder(descr):
    model = MLPModelBuilder(descr, train_config={'loss': 'l1_loss'}).build()
    x = np.random.randn(4, 16).astype(np.float32)
    y = model(x)
    assert np.asarray(y).shape == (4, 1)


def test_ensemble_builder(descr):
    builder = EnsembleModelBuilder(descr, {'num_models': 3})
    info = builder.get_info()
    assert info.get_num_models() == 3
    model = builder.build()
    assert model.num_models == 3
    x = np.random.randn(4, 16).astype(np.float32)
    pred, ue = model(x, return_ue=True)
    assert np.asarray(pred).shape == (4, 1)
    assert np.asarray(ue).shape == (4, 1)
    assert float(np.asarray(ue).mean()) > 0   # members differ by init


def test_duq_input_doubling(descr):
    builder = DeltaUQMLPModelBuilder(descr, {'estimator': 'std'})
    model = builder.build()
    assert model.net.layers[0].in_features == 32   # 16 -> 32
    info = builder.get_info()
    assert info.get_estimator() == 'std'
    # doubling happens exactly once even if build/get_info is called again
    builder.update_info(builder.get_info())
    assert builder.get_info().num_inputs() == 32


def test_pager_input_doubling():
    descr3 = [{'Linear': {'args': [3, 8]}}, {'ReLU': {}},
              {'Linear': {'args': [8, 1]}}]
    builder = PAGERModelBuilder(descr3, {'estimator': 'std'})
    model = builder.build()
    assert model.net.layers[0].in_features == 6    # 3 -> 6


def test_mc_dropout_rewrite(descr):
    builder = MCDropoutModelBuilder(
        descr, {'num_samples': 4, 'dropout_percent': 0.25})
    model = builder.build()
    names = [type(l).__name__ for l in model.net.layers]
    # dropout before every *hidden* Linear; first/last blocks untouched
    assert names == ['Linear', 'BatchNorm1d', 'ReLU', 'Dropout', 'Linear',
                     'ReLU', 'Linear']
    drop = [l for l in model.net.layers if isinstance(l, Dropout)]
    assert all(d.p == 0.25 for d in drop)
    info = builder.get_info()
    assert info.get_num_samples() == 4
    assert info.get_dropout_percent() == 0.25


def test_mc_dropout_active_in_eval(descr):
    model = MCDropoutModelBuilder(
        descr, {'num_samples': 8, 'dropout_percent': 0.3}).build()
    x = np.random.randn(16, 16).astype(np.float32)
    _, ue = model(x, return_ue=True)
    # stochastic eval passes must differ -> positive spread
    assert float(np.asarray(ue).mean()) > 0


def test_kde_builders(descr):
    kde = KDEModelBuilder(descr, {'rtol': 1000}).build()
    assert kde.rtol == pytest.approx(0.1)
    knn = KNNKDEModelBuilder(descr, {'k': 7}).build()
    assert knn.k == 7


def test_duq_anchorless_eval_returns_doubled_batch():
    """Reference parity: eval before anchors are set falls back to the
    doubled training-style forward (reference models.py:319-322)."""
    descr3 = [{'Linear': {'args': [3, 8]}}, {'ReLU': {}},
              {'Linear': {'args': [8, 1]}}]
    model = DeltaUQMLPModelBuilder(descr3, {'estimator': 'std',
                                            'num_anchors': 4}).build()
    x = np.random.randn(10, 3).astype(np.float32)
    out = model(x)
    assert np.asarray(out).shape == (20, 1)
    model.anchors = x[:4]
    pred, ue = model(x, return_ue=True)
    assert np.asarray(pred).shape == (10, 1)
    assert np.asarray(ue).shape == (10, 1)


def test_mc_dropout_stream_advances_and_reseeds(descr):
    """Two consecutive evaluations draw different MC samples (the
    reference consumes torch's global RNG across calls); reseed()
    restores the stream for reproducibility studies."""
    import jax
    model = MCDropoutModelBuilder(
        descr, {'num_samples': 8, 'dropout_percent': 0.5}).build()
    model.init(jax.random.PRNGKey(0), (16,))
    x = np.random.randn(32, 16).astype(np.float32)

    _, ue1 = model(x, return_ue=True)
    _, ue2 = model(x, return_ue=True)
    assert not np.allclose(np.asarray(ue1), np.asarray(ue2))

    model.reseed(0)
    _, ue3 = model(x, return_ue=True)
    np.testing.assert_allclose(np.asarray(ue1), np.asarray(ue3), rtol=1e-6)

    model.reseed(123)
    _, ue4 = model(x, return_ue=True)
    assert not np.allclose(np.asarray(ue1), np.asarray(ue4))
