"""CNN-surrogate path: YAML Conv2d arch builds, trains end-to-end and
produces ensemble UE (the reference supports CNN archs via its
CNNInfoGrabber / deltaUQ_CNN surface)."""
import numpy as np
import pytest

from nnueehcs_tpu.model_builder import (MLPModelBuilder, EnsembleModelBuilder,
                                        ModelInfo)
from nnueehcs_tpu.training import Trainer, DataLoader, ArrayDataset, EarlyStopping

CNN_DESCR = [
    {'Conv2d': {'args': [1, 4, 3], 'padding': 1}},
    {'BatchNorm2d': {'args': [4]}},
    {'ReLU': {}},
    {'MaxPool2d': {'args': [2]}},
    {'Flatten': {}},
    {'Linear': {'args': [4 * 4 * 4, 16]}},
    {'ReLU': {}},
    {'Linear': {'args': [16, 1]}},
]


@pytest.fixture
def image_data():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 1, 8, 8)).astype(np.float32)
    y = x.mean(axis=(1, 2, 3), keepdims=False)[:, None].astype(np.float32)
    return x, y


def test_cnn_info_grabber():
    import copy
    # info grabbers mutate the descr in place (reference behaviour) — copy
    info = ModelInfo.get_info_grabber(copy.deepcopy(CNN_DESCR))
    assert info.is_cnn()
    assert info.num_inputs() == 1
    info.set_num_inputs(2)
    assert info.num_inputs() == 2


def test_cnn_trains(image_data):
    x, y = image_data
    model = MLPModelBuilder(CNN_DESCR,
                            train_config={'loss': 'mse_loss'}).build()
    # CNN init is deferred to fit time (spatial shape unknown from YAML)
    assert not model.initialized
    dl = DataLoader(ArrayDataset(x, y), batch_size=32, drop_last=True)
    tr = Trainer('cnn', {'accelerator': 'cpu', 'max_epochs': 10,
                         'gradient_clip_val': 5},
                 callbacks=[EarlyStopping(patience=100)],
                 log_dir='/tmp/cnn_logs')
    tr.fit(model, dl, dl)
    pred = model(x)
    assert np.asarray(pred).shape == (64, 1)
    assert np.isfinite(tr.callback_metrics['val_loss'])


@pytest.mark.slow
def test_cnn_ensemble_ue(image_data):
    x, y = image_data
    model = EnsembleModelBuilder(CNN_DESCR, {'num_models': 3},
                                 train_config={'loss': 'mse_loss'}).build()
    dl = DataLoader(ArrayDataset(x, y), batch_size=32, drop_last=True)
    tr = Trainer('cnn_ens', {'accelerator': 'cpu', 'max_epochs': 3},
                 callbacks=[EarlyStopping(patience=100)],
                 log_dir='/tmp/cnn_logs')
    tr.fit(model, dl, dl)
    pred, ue = model(x, return_ue=True)
    assert np.asarray(pred).shape == (64, 1)
    assert float(np.asarray(ue).mean()) > 0


@pytest.mark.slow
def test_cnn_delta_uq_channel_anchoring(image_data):
    """ΔUQ on a Conv2d-first net: the builder doubles in_channels and the
    anchored input concatenates along the CHANNEL axis (VERDICT r1 #5 —
    feature-axis concat would silently feed (1ch anchor | 1ch delta) as a
    width-doubled 1-channel image)."""
    import jax
    from nnueehcs_tpu.model_builder import DeltaUQMLPModelBuilder
    from nnueehcs_tpu.models.delta_uq import anchored_input

    x, y = image_data
    model = DeltaUQMLPModelBuilder(
        CNN_DESCR, {'estimator': 'std', 'num_anchors': 3},
        train_config={'loss': 'mse_loss'}).build()
    # first conv now takes 2 channels
    assert model.net.layers[0].in_channels == 2

    a = np.zeros_like(x)
    anch = np.asarray(anchored_input(np.asarray(x), a))
    assert anch.shape == (64, 2, 8, 8)

    dl = DataLoader(ArrayDataset(x, y), batch_size=32, drop_last=True)
    tr = Trainer('cnn_duq', {'accelerator': 'cpu', 'max_epochs': 2},
                 callbacks=model.get_callbacks() + [EarlyStopping(patience=100)],
                 log_dir='/tmp/cnn_logs')
    tr.fit(model, dl, dl)
    assert model.anchors is not None and model.anchors.shape[1:] == (1, 8, 8)
    pred, ue = model(x, return_ue=True)
    assert np.asarray(pred).shape == (64, 1)
    assert np.asarray(ue).shape == (64, 1)
    assert np.all(np.isfinite(np.asarray(ue)))


def test_cnn_pager_ue(image_data):
    from nnueehcs_tpu.model_builder import PAGERModelBuilder

    x, y = image_data
    model = PAGERModelBuilder(
        CNN_DESCR, {'estimator': 'std'},
        train_config={'loss': 'mse_loss'}).build()
    dl = DataLoader(ArrayDataset(x, y), batch_size=32, drop_last=True)
    tr = Trainer('cnn_pager', {'accelerator': 'cpu', 'max_epochs': 2},
                 callbacks=model.get_callbacks() + [EarlyStopping(patience=100)],
                 log_dir='/tmp/cnn_logs')
    tr.fit(model, dl, dl)
    pred, ue = model(x, return_ue=True)
    assert np.asarray(pred).shape == (64, 1)
    assert np.all(np.asarray(ue) >= 0)
