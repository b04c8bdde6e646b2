"""Trainer hooks (the reference's Lightning callbacks, made explicit).

The reference attaches UQ-specific behaviour — KDE fitting, anchor capture —
as Lightning callbacks observing epoch-0 training batches (reference
``nnueehcs/models.py:225-243, 267-285, 354-373, 450-472``).  Here they are
plain hook objects invoked by :class:`nnueehcs_tpu.training.Trainer` at the
same points in the loop.
"""
from __future__ import annotations

import numpy as np


class TrainerHook:
    """Hook points mirroring the Lightning callback surface the reference
    relies on."""

    def on_fit_start(self, trainer, model):
        pass

    def on_train_batch_end(self, trainer, model, batch, batch_idx):
        pass

    def on_train_epoch_end(self, trainer, model):
        pass

    def on_validation_epoch_start(self, trainer, model):
        pass

    def on_validation_end(self, trainer, model, metrics):
        pass

    def on_fit_end(self, trainer, model):
        pass

    def fusion_quiescent(self, epoch) -> bool:
        """True when, for ``epoch``, this hook will not mutate the model in
        ``on_train_epoch_end``/``on_validation_epoch_start`` — the trainer
        may then fold validation into the fused epoch program (one host
        sync per epoch).  The whole-fit gate also asks about FUTURE epochs
        (``epoch`` beyond the current one), so implementations must answer
        predictively — the built-in fit hooks are monotone (quiescent
        forever once their epoch-0 fit is done), which makes the current
        state a valid prediction.  Default: quiescent unless the hook
        overrides one of those mutation points."""
        cls = type(self)
        return (cls.on_validation_epoch_start
                is TrainerHook.on_validation_epoch_start
                and cls.on_train_epoch_end is TrainerHook.on_train_epoch_end)


class EpochZeroFitHook(TrainerHook):
    """Base for the UQ fit/anchor-capture hooks: they consume epoch-0
    training batches (data only — the trainer may deliver them in bulk
    after the scanned epoch) and mutate the model exactly once at the end
    of that fitting window."""

    batch_data_only = True

    def __init__(self):
        self._train_data_to_fit = []
        self._epochs = 0

    def fusion_quiescent(self, epoch):
        # fit/capture happens during epoch 0; afterwards only the epoch
        # counter advances (no model mutation) — monotone, so this also
        # answers correctly for future epochs
        return self._epochs >= 1


class KDEFitHook(EpochZeroFitHook):
    """Buffer epoch-0 training inputs, fit the KDE at the end of epoch 0
    (reference ``nnueehcs/models.py:225-240``)."""

    # only consumes the batch *data* (never mid-epoch model state), so the
    # trainer may run the scanned epoch and deliver batches afterwards
    # instead of dropping to 1000 sequential per-batch dispatches
    def on_train_batch_end(self, trainer, model, batch, batch_idx):
        if self._epochs == 0:
            self._train_data_to_fit.append(np.asarray(batch[0]))

    def on_train_epoch_end(self, trainer, model):
        print(f'Fitting KDE on {len(self._train_data_to_fit)} batches')
        if self._epochs == 0:
            model.fit_kde(np.concatenate(self._train_data_to_fit))
        self._epochs += 1


class KNNKDEFitHook(EpochZeroFitHook):
    """Same capture, but fit happens at the first validation-epoch start
    (reference ``nnueehcs/models.py:267-281``)."""

    def on_train_batch_end(self, trainer, model, batch, batch_idx):
        if self._epochs == 0:
            self._train_data_to_fit.append(np.asarray(batch[0]))

    def on_validation_epoch_start(self, trainer, model):
        if self._epochs == 0 and self._train_data_to_fit:
            model.fit_kde(np.concatenate(self._train_data_to_fit))
        self._epochs += 1


class DeltaUQGetAnchorsHook(EpochZeroFitHook):
    """Capture the first ``num_anchors`` training inputs during epoch 0 and
    install them as anchors before the first validation epoch (reference
    ``nnueehcs/models.py:354-369``)."""

    def on_train_batch_end(self, trainer, model, batch, batch_idx):
        bs = np.asarray(batch[0]).shape[0]
        if self._epochs == 0 and bs * len(self._train_data_to_fit) < model.num_anchors:
            self._train_data_to_fit.append(np.asarray(batch[0]))

    def on_validation_epoch_start(self, trainer, model):
        if self._epochs == 0 and self._train_data_to_fit:
            data = np.concatenate(self._train_data_to_fit)
            model.anchors = data[:model.num_anchors]
        self._epochs += 1


class PAGERGetAnchorsHook(EpochZeroFitHook):
    """Like :class:`DeltaUQGetAnchorsHook` but also captures anchor targets
    (reference ``nnueehcs/models.py:450-472``)."""

    def __init__(self):
        super().__init__()
        self._anchor_X = []
        self._anchor_Y = []

    def on_train_batch_end(self, trainer, model, batch, batch_idx):
        bs = np.asarray(batch[0]).shape[0]
        if self._epochs == 0 and bs * len(self._anchor_X) < model.num_anchors:
            self._anchor_X.append(np.asarray(batch[0]))
            self._anchor_Y.append(np.asarray(batch[1]))

    def on_validation_epoch_start(self, trainer, model):
        if self._epochs == 0 and self._anchor_X:
            n = model.num_anchors
            model.anchors = np.concatenate(self._anchor_X)[:n]
            model.anchors_Y = np.concatenate(self._anchor_Y)[:n]
        self._epochs += 1
