"""Production inference: warm-compiled UQ predictors.

Serving-oriented wrapper around a trained model bundle:

- loads a checkpoint (pickle bundle or Orbax directory),
- warms the UQ forward for a fixed set of batch buckets at startup by
  driving the model's stateful eval once per bucket — compilation cost is
  paid before the first request, and the model-specific fast paths (the
  fused VMEM-resident Pallas kernels on TPU) engage for serving too,
- pads requests to the nearest bucket and trims the result (row-independent
  forwards make padding exact); oversized requests are chunked,
- optionally shards request batches over a device mesh.

The reference has no serving surface; this is the deployment-side
complement to the evaluation harness.
"""
from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .training.checkpoint import load_model

DEFAULT_BUCKETS = (256, 1024, 4096, 16384, 65536)


class Predictor:
    def __init__(self, model_or_path, buckets: Sequence[int] = DEFAULT_BUCKETS,
                 return_ue: bool = True, mesh=None, warmup: bool = True):
        if isinstance(model_or_path, str):
            self.model = load_model(model_or_path)
        else:
            self.model = model_or_path
        if mesh is not None:
            self.model.attach_mesh(mesh)
        self.return_ue = return_ue
        self.buckets = tuple(sorted(buckets))
        self._num_features = self._infer_features()
        if warmup:
            self.warmup()

    def _infer_features(self) -> Optional[int]:
        info_layers = [l for l in self.model.net.layers
                       if hasattr(l, 'in_features')]
        if not info_layers:
            return None
        n = info_layers[0].in_features
        if self.model.uq_method in ('delta_uq', 'pager'):
            n //= 2      # anchored input doubles the first layer
        return n

    @property
    def num_features(self):
        return self._num_features

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _run_bucket(self, chunk):
        """One exactly-bucket-sized forward through the model's stateful
        eval — this engages the model-specific fast paths (fused Pallas
        kernels on TPU) and populates the model's own jit cache, which is
        our AOT store (keyed by bucket size)."""
        return self.model(jnp.asarray(chunk), return_ue=self.return_ue)

    def warmup(self):
        """Compile every bucket ahead of time by driving one forward per
        bucket size through the model."""
        start = time.time()
        from .utils.timing import device_sync
        for b in self.buckets:
            zeros = np.zeros((b, self._num_features),
                             np.dtype(self.model.dtype))
            device_sync(self._run_bucket(zeros))
        return time.time() - start

    def predict(self, x):
        """Returns ``(pred, ue)`` (or just ``pred`` when
        ``return_ue=False``) as numpy arrays."""
        x = np.asarray(x, dtype=np.dtype(self.model.dtype))
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        n = x.shape[0]
        out_chunks = []
        pos = 0
        while pos < n:
            take = min(n - pos, self.buckets[-1])
            bucket = self._bucket(take)
            chunk = x[pos:pos + take]
            if take < bucket:
                chunk = np.concatenate(
                    [chunk, np.broadcast_to(chunk[:1],
                                            (bucket - take,) + chunk.shape[1:])])
            out = self._run_bucket(chunk)
            if isinstance(out, tuple):
                out_chunks.append(tuple(np.asarray(o)[:take] for o in out))
            else:
                out_chunks.append(np.asarray(out)[:take])
            pos += take

        if isinstance(out_chunks[0], tuple):
            merged = tuple(np.concatenate([c[i] for c in out_chunks])
                           for i in range(len(out_chunks[0])))
        else:
            merged = np.concatenate(out_chunks)

        def trim(o):
            return o[0] if squeeze else o
        if isinstance(merged, tuple):
            return tuple(trim(o) for o in merged)
        return trim(merged)
