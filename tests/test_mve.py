"""MVE (heteroscedastic Gaussian head) tests: output widening, NLL
training, calibrated sigma on heteroscedastic data, checkpoint round trip."""
import numpy as np
import pytest

from nnueehcs_tpu.model_builder import MVEModelBuilder
from nnueehcs_tpu.training import (Trainer, DataLoader, ArrayDataset,
                                   EarlyStopping, save_model, load_model)

DESCR = [{'Linear': {'args': [2, 32]}}, {'ReLU': {}},
         {'Linear': {'args': [32, 1]}}]


def test_builder_widens_output():
    builder = MVEModelBuilder(DESCR)
    model = builder.build()
    assert model.net.layers[-1].out_features == 2
    # widening happens exactly once
    builder.update_info(builder.get_info())
    assert builder.model_descr[-1]['Linear']['args'][1] == 2


def test_mve_ue_contract():
    model = MVEModelBuilder(DESCR).build()
    x = np.random.randn(16, 2).astype(np.float32)
    pred = model(x)
    assert np.asarray(pred).shape == (16, 1)
    pred, sigma = model(x, return_ue=True)
    assert np.asarray(sigma).shape == (16, 1)
    assert np.all(np.asarray(sigma) > 0)


def test_mve_learns_heteroscedastic_noise():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(2048, 2)).astype(np.float32)
    # noise scale depends on |x0|: quiet near 0, noisy at the edges
    noise_scale = 0.05 + 0.5 * np.abs(x[:, :1])
    y = (x.sum(1, keepdims=True)
         + rng.normal(size=(2048, 1)) * noise_scale).astype(np.float32)

    model = MVEModelBuilder(
        DESCR, train_config={'learning_rate': 3e-3}).build()
    tr = Trainer('mve', {'accelerator': 'cpu', 'max_epochs': 300},
                 callbacks=[EarlyStopping(patience=1000)],
                 log_dir='/tmp/mve_logs')
    tr.fit(model, DataLoader(ArrayDataset(x, y), 256, shuffle=True,
                             drop_last=True),
           DataLoader(ArrayDataset(x, y), 256))

    quiet = np.zeros((64, 2), np.float32)
    noisy = np.zeros((64, 2), np.float32)
    noisy[:, 0] = 0.95
    _, s_quiet = model(quiet, return_ue=True)
    _, s_noisy = model(noisy, return_ue=True)
    assert float(np.mean(np.asarray(s_noisy))) > \
        1.5 * float(np.mean(np.asarray(s_quiet)))


def test_mve_checkpoint_round_trip(tmp_path):
    model = MVEModelBuilder(DESCR, {'min_variance': 1e-5}).build()
    x = np.random.randn(4, 2).astype(np.float32)
    ref_p, ref_s = model(x, return_ue=True)
    path = str(tmp_path / 'model.pth')
    save_model(model, path)
    m2 = load_model(path)
    p, s = m2(x, return_ue=True)
    assert np.allclose(np.asarray(p), np.asarray(ref_p), atol=1e-6)
    assert np.allclose(np.asarray(s), np.asarray(ref_s), atol=1e-6)
    assert m2.min_variance == pytest.approx(1e-5)
