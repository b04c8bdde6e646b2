"""Serving tests: AOT-compiled predictor buckets, padding exactness,
multi-chunk requests, checkpoint loading."""
import numpy as np
import pytest

from nnueehcs_tpu.model_builder import EnsembleModelBuilder, DeltaUQMLPModelBuilder
from nnueehcs_tpu.serving import Predictor
from nnueehcs_tpu.training import save_model

DESCR = [{'Linear': {'args': [3, 16]}}, {'ReLU': {}},
         {'Linear': {'args': [16, 1]}}]


@pytest.fixture
def model():
    return EnsembleModelBuilder(DESCR, {'num_models': 3},
                                train_config={'loss': 'l1_loss'}).build()


def test_predictor_matches_model(model):
    pred = Predictor(model, buckets=(32, 128), warmup=True)
    x = np.random.randn(50, 3).astype(np.float32)
    ref_p, ref_u = model(x, return_ue=True)
    p, u = pred.predict(x)
    assert np.allclose(p, np.asarray(ref_p), atol=1e-5)
    assert np.allclose(u, np.asarray(ref_u), atol=1e-5)


def test_predictor_chunks_large_requests(model):
    pred = Predictor(model, buckets=(32,), warmup=False)
    x = np.random.randn(100, 3).astype(np.float32)   # > largest bucket
    p, u = pred.predict(x)
    assert p.shape == (100, 1)
    ref_p, _ = model(x, return_ue=True)
    assert np.allclose(p, np.asarray(ref_p), atol=1e-5)


def test_predictor_single_row(model):
    pred = Predictor(model, buckets=(32,), warmup=False)
    p, u = pred.predict(np.zeros(3, np.float32))
    assert p.shape == (1,)


def test_predictor_from_checkpoint(model, tmp_path):
    path = str(tmp_path / 'model.pth')
    save_model(model, path)
    pred = Predictor(path, buckets=(32,), warmup=False)
    assert pred.num_features == 3
    p, u = pred.predict(np.random.randn(8, 3).astype(np.float32))
    assert p.shape == (8, 1)


def test_predictor_infers_anchored_features():
    duq = DeltaUQMLPModelBuilder(DESCR, {'estimator': 'std',
                                         'num_anchors': 4}).build()
    duq.anchors = np.random.randn(4, 3).astype(np.float32)
    pred = Predictor(duq, buckets=(32,), warmup=False)
    assert pred.num_features == 3     # halves the doubled anchored input
    p, u = pred.predict(np.random.randn(8, 3).astype(np.float32))
    assert p.shape == (8, 1)
