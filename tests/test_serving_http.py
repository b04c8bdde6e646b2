"""The HTTP serving example, driven in-process: endpoints, payload
validation, and latency fields."""
import json
import sys
import threading
import urllib.request
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nnueehcs_tpu.model_builder import EnsembleModelBuilder
from nnueehcs_tpu.serving import Predictor


@pytest.fixture(scope='module')
def server():
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                           / 'examples' / 'serving'))
    from serve import make_handler
    from http.server import ThreadingHTTPServer

    model = EnsembleModelBuilder(
        [{'Linear': {'args': [3, 8]}}, {'ReLU': {}},
         {'Linear': {'args': [8, 1]}}],
        {'num_models': 2}, train_config={'loss': 'l1_loss'}).build()
    predictor = Predictor(model, buckets=(32,), warmup=True)
    httpd = ThreadingHTTPServer(('127.0.0.1', 0), make_handler(predictor))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f'http://127.0.0.1:{httpd.server_address[1]}'
    httpd.shutdown()


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={'Content-Type': 'application/json'})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    status, body = _get(server + '/healthz')
    assert status == 200
    assert body['uq_method'] == 'ensemble'
    assert body['num_features'] == 3


def test_predict(server):
    x = np.random.randn(5, 3).tolist()
    status, body = _post(server + '/predict', {'inputs': x})
    assert status == 200
    assert len(body['predictions']) == 5
    assert len(body['uncertainty']) == 5
    assert body['latency_ms'] >= 0


def test_predict_wrong_shape(server):
    status, body = _post(server + '/predict', {'inputs': [[1.0, 2.0]]})
    assert status == 400
    assert 'error' in body


def test_unknown_path(server):
    status, body = _get(server + '/nope')
    assert status == 404
