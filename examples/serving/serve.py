"""Minimal UQ inference server.

Serves a trained model bundle over HTTP with AOT-compiled forwards::

    python examples/serving/serve.py --model results/.../model.pth --port 8080

    POST /predict   {"inputs": [[...], ...]}
      -> {"predictions": [...], "uncertainty": [...], "latency_ms": ...}
    GET  /healthz   -> {"status": "ok", "uq_method": "...", ...}
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import click
import numpy as np

from nnueehcs_tpu.serving import Predictor


def make_handler(predictor: Predictor):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/healthz':
                self._send(200, {
                    'status': 'ok',
                    'uq_method': predictor.model.uq_method,
                    'num_features': predictor.num_features,
                    'buckets': list(predictor.buckets),
                })
            else:
                self._send(404, {'error': 'unknown path'})

        def do_POST(self):
            if self.path != '/predict':
                self._send(404, {'error': 'unknown path'})
                return
            try:
                length = int(self.headers.get('Content-Length', 0))
                payload = json.loads(self.rfile.read(length))
                if not isinstance(payload, dict):
                    self._send(400, {'error': 'body must be a JSON object '
                                              'with an "inputs" key'})
                    return
                x = np.asarray(payload['inputs'], np.float32)
                if x.ndim != 2 or x.shape[1] != predictor.num_features:
                    self._send(400, {
                        'error': f'inputs must be (n, '
                                 f'{predictor.num_features})',
                        'got': list(x.shape)})
                    return
                start = time.perf_counter()
                out = predictor.predict(x)
                latency = (time.perf_counter() - start) * 1e3
                if isinstance(out, tuple):
                    pred, ue = out
                    self._send(200, {
                        'predictions': np.asarray(pred).ravel().tolist(),
                        'uncertainty': np.asarray(ue).ravel().tolist(),
                        'latency_ms': round(latency, 3)})
                else:
                    self._send(200, {
                        'predictions': np.asarray(out).ravel().tolist(),
                        'latency_ms': round(latency, 3)})
            except (KeyError, ValueError, TypeError,
                    json.JSONDecodeError) as e:
                self._send(400, {'error': str(e)})

        def log_message(self, fmt, *args):
            pass

    return Handler


@click.command()
@click.option('--model', 'model_path', required=True,
              help='Path to a model.pth bundle or orbax checkpoint dir')
@click.option('--host', default='127.0.0.1')
@click.option('--port', default=8080, type=int)
@click.option('--buckets', default='256,1024,4096',
              help='Comma-separated AOT batch buckets')
@click.option('--platform', default=None,
              help="Force a jax platform (e.g. 'cpu'); the ambient "
                   'environment may pin a TPU plugin regardless of env vars')
def main(model_path, host, port, buckets, platform):
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    bucket_list = [int(b) for b in buckets.split(',')]
    print(f'Loading {model_path} and compiling buckets {bucket_list} ...')
    predictor = Predictor(model_path, buckets=bucket_list)
    server = ThreadingHTTPServer((host, port), make_handler(predictor))
    print(f'Serving {predictor.model.uq_method} UQ model on '
          f'http://{host}:{port}')
    server.serve_forever()


if __name__ == '__main__':
    main()
