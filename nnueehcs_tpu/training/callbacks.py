"""Trainer callbacks: early stopping and best-model checkpointing.

Re-specifications of the Lightning behaviours the reference relies on
implicitly (reference ``nnueehcs/training.py:16-18, 41-65``;
``examples/bo_driven/bo.py:166-175``).
"""
from __future__ import annotations

import math
import os

from .checkpoint import save_model
from .hooks import TrainerHook


class EarlyStopping(TrainerHook):
    """Stop when the monitored metric hasn't improved by ``min_delta`` for
    ``patience`` validation epochs (Lightning defaults: patience=3,
    min_delta=0.0, mode='min')."""

    def __init__(self, monitor: str = 'val_loss', min_delta: float = 0.0,
                 patience: int = 3, verbose: bool = False, mode: str = 'min'):
        self.monitor = monitor
        self.min_delta = abs(min_delta)
        self.patience = patience
        self.verbose = verbose
        self.mode = mode
        self.wait_count = 0
        self.best_score = math.inf if mode == 'min' else -math.inf
        self.stopped_epoch = 0

    def _improved(self, current) -> bool:
        if self.mode == 'min':
            return current < self.best_score - self.min_delta
        return current > self.best_score + self.min_delta

    def on_validation_end(self, trainer, model, metrics):
        current = metrics.get(self.monitor)
        if current is None:
            return
        if self._improved(current):
            self.best_score = current
            self.wait_count = 0
        else:
            self.wait_count += 1
            if self.wait_count >= self.patience:
                trainer.should_stop = True
                self.stopped_epoch = trainer.current_epoch
                if self.verbose:
                    print(f'EarlyStopping: stopping at epoch {trainer.current_epoch}')


class ModelSavingCallback(TrainerHook):
    """Save the whole model bundle whenever the monitored metric improves
    (reference ``nnueehcs/training.py:41-65``). The file name defaults to
    ``model.pth`` for results-tree compatibility.

    ``defer_serialization=True`` is the low-overhead mode for slow
    host↔device links: improvements only *pin* the winning params/state
    pytrees (zero-cost device references); the bundle is serialized once at
    fit end.  Trades crash-recoverability of the in-progress trial for not
    transferring every improving epoch's parameters to the host.
    """

    def __init__(self, monitor: str = 'val_loss', save_path=None,
                 model_name: str = 'model.pth',
                 defer_serialization: bool = False):
        self.monitor = monitor
        self.save_path = save_path
        self.model_name = model_name
        self.defer_serialization = defer_serialization
        self._pinned = None

    def on_fit_start(self, trainer, model):
        self.trainer = trainer
        if self.save_path is None:
            self.save_path = trainer.logger.log_dir

    def on_validation_end(self, trainer, model, metrics):
        if self.monitor not in metrics:
            return
        current = metrics[self.monitor]
        if not hasattr(self, 'best') or current < self.best:
            self.best = current
            if self.defer_serialization:
                # device-side copy: the live buffers get donated by the next
                # train step; a copy stays on-device (no host transfer)
                import jax.numpy as jnp
                import jax
                self._pinned = jax.tree_util.tree_map(
                    jnp.copy, (model.params, model.state))
            else:
                self.save_checkpoint(model)

    def on_fit_end(self, trainer, model):
        if self.defer_serialization and self._pinned is not None:
            live = (model.params, model.state)
            model.params, model.state = self._pinned
            try:
                self.save_checkpoint(model)
            finally:
                model.params, model.state = live

    def save_checkpoint(self, model):
        os.makedirs(self.save_path, exist_ok=True)
        save_model(model, os.path.join(self.save_path, self.model_name))
