"""Array-first data loading.

The reference wraps datasets in torch ``DataLoader``s (reference
``examples/bo_driven/bo.py:402-403``).  On TPU the efficient shape is the
opposite: materialise the whole dataset as device arrays once, then slice
batches by a shuffled index permutation inside (or right outside) the jitted
step — no per-item python iteration, no host↔device churn per batch.

:class:`DataLoader` keeps the reference's knobs (``batch_size``, ``shuffle``,
``drop_last``) but exposes the arrays and batching *plan* to the trainer
rather than an item iterator.
"""
from __future__ import annotations

import numpy as np


class ArrayDataset:
    """(inputs, outputs) pair — replacement for torch TensorDataset."""

    def __init__(self, inputs, outputs):
        self.input = np.asarray(inputs)
        self.output = np.asarray(outputs)
        assert len(self.input) == len(self.output)

    def __len__(self):
        return len(self.input)

    def __getitem__(self, idx):
        return self.input[idx], self.output[idx]


def _extract_arrays(dataset):
    if hasattr(dataset, 'input') and hasattr(dataset, 'output'):
        return np.asarray(dataset.input), np.asarray(dataset.output)
    # generic indexable of (x, y) pairs
    xs, ys = zip(*[dataset[i] for i in range(len(dataset))])
    return np.stack(xs), np.stack(ys)


class DataLoader:
    def __init__(self, dataset, batch_size: int = 32, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.inputs, self.outputs = _extract_arrays(dataset)

    def __len__(self):
        n = len(self.inputs)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def num_samples(self):
        return len(self.inputs)

    def __iter__(self):
        """Host-side iteration (used for hooks/debug, not the hot path)."""
        n = len(self.inputs)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed).permutation(n)
        nb = len(self)
        for b in range(nb):
            sl = idx[b * self.batch_size:(b + 1) * self.batch_size]
            yield self.inputs[sl], self.outputs[sl]
