"""CSV metrics logger with the Lightning CSVLogger directory/file contract.

Downstream tools (the results tree, collate plots and the golden training
tests) read ``<save_dir>/<name>/<version>/metrics.csv`` with interleaved
``train_loss``/``val_loss`` rows plus ``epoch``/``step`` columns — the exact
layout Lightning's CSVLogger produced for the reference (reference
``nnueehcs/training.py:19-21``; consumers ``tests/test_training.py:79-86``).
"""
from __future__ import annotations

import csv
import os
from typing import Optional

import yaml


class CSVLogger:
    def __init__(self, save_dir: str, name: str = 'default',
                 version: Optional[str] = None):
        self.save_dir = save_dir
        self.name = name
        if version is None:
            version = self._next_version(os.path.join(save_dir, name))
        self.version = version
        self._rows = []
        self._keys = []
        self._hparams = {}
        # incremental-save bookkeeping: rewrite the file only when the
        # column set changes, otherwise append new rows (save() runs every
        # epoch; a full rewrite would make long fits quadratic in epochs)
        self._flushed = 0
        self._flushed_keys = None

    @staticmethod
    def _next_version(root: str) -> str:
        existing = []
        if os.path.isdir(root):
            for item in os.listdir(root):
                if item.startswith('version_'):
                    try:
                        existing.append(int(item.split('_')[1]))
                    except (IndexError, ValueError):
                        pass
        return f'version_{max(existing) + 1 if existing else 0}'

    @property
    def log_dir(self) -> str:
        version = self.version
        if isinstance(version, int):
            version = f'version_{version}'
        return os.path.join(self.save_dir, self.name, str(version))

    def log_hyperparams(self, params: dict):
        self._hparams.update(params)
        os.makedirs(self.log_dir, exist_ok=True)
        with open(os.path.join(self.log_dir, 'hparams.yaml'), 'w') as f:
            yaml.safe_dump(_yaml_safe(self._hparams), f)

    def log_metrics(self, metrics: dict, step: Optional[int] = None):
        row = dict(metrics)
        if step is not None:
            row['step'] = step
        for k in row:
            if k not in self._keys:
                self._keys.append(k)
        self._rows.append(row)

    def save(self):
        if not self._rows:
            return
        os.makedirs(self.log_dir, exist_ok=True)
        path = os.path.join(self.log_dir, 'metrics.csv')
        fresh = (self._flushed_keys != self._keys
                 or not os.path.exists(path))
        start = 0 if fresh else self._flushed
        if start >= len(self._rows) and not fresh:
            return
        with open(path, 'w' if fresh else 'a', newline='') as f:
            writer = csv.DictWriter(f, fieldnames=self._keys)
            if fresh:
                writer.writeheader()
            for row in self._rows[start:]:
                writer.writerow(row)
        self._flushed = len(self._rows)
        self._flushed_keys = list(self._keys)

    def finalize(self):
        self.save()


def _yaml_safe(obj):
    if isinstance(obj, dict):
        return {k: _yaml_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_yaml_safe(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return repr(obj)
