"""YAML architecture → UQ-wrapped model builders.

Same builder surface as the reference (reference
``nnueehcs/model_builder.py:130-295``): one builder per UQ method, each
consuming the YAML layer list plus the method's descriptor dict.  Notable
behavioural contracts preserved:

- ΔUQ/PAGER double the first layer's input width exactly once
  (``_updated`` latch — reference ``model_builder.py:185-188, 213-215``),
- MC-dropout rewrites the layer list to put a Dropout before every hidden
  Linear/Conv2d (first and last blocks excluded — reference
  ``model_builder.py:254-263``),
- the ensemble builds ``num_models`` members from deterministic seeds
  (seed 42 + member index — reference ``model_builder.py:227-231``); here
  the members are one stacked parameter pytree initialised from per-member
  folded PRNG keys,
- ``get_info()`` exposes ``is_mlp/is_cnn/num_inputs`` plus method-specific
  accessors installed by ``update_info``.

Built models come out with initialised parameters (seeded like the
reference's eagerly-initialised torch modules), ready for forward passes or
training.
"""
from __future__ import annotations

import copy

import jax

from .nn.network import build_network
from .models import (MLPModel, KDEMLPModel, KNNKDEMLPModel, DeltaUQMLP,
                     EnsembleModel, PAGERMLP, MCDropoutModel, MVEMLPModel)


class InfoGrabbBase:
    def __init__(self, descr):
        self.descr = descr

    def num_layers(self):
        return len(self.descr)


class CNNInfoGrabber(InfoGrabbBase):
    def is_cnn(self):
        return True

    def is_mlp(self):
        return False

    def num_inputs(self):
        return self.descr[0]['Conv2d']['args'][0]

    def set_num_inputs(self, num_inputs):
        self.descr[0]['Conv2d']['args'][0] = num_inputs


class MLPInfoGrabber(InfoGrabbBase):
    def is_mlp(self):
        return True

    def is_cnn(self):
        return False

    def num_inputs(self):
        return self.descr[0]['Linear']['args'][0]

    def set_num_inputs(self, num_inputs):
        self.descr[0]['Linear']['args'][0] = num_inputs


class ModelInfo:
    @classmethod
    def get_info_grabber(cls, model_descr):
        if 'Conv2d' in model_descr[0]:
            return CNNInfoGrabber(model_descr)
        return MLPInfoGrabber(model_descr)


class ModelBuilder:
    def __init__(self, model_descr, **kwargs):
        self.model_descr = copy.deepcopy(model_descr)
        self.train_config = kwargs.get('train_config')
        self.seed = kwargs.get('seed', 42)

    def build(self):
        return build_network(self.model_descr)

    def update_info(self, info):
        return info

    def get_info(self):
        info = ModelInfo.get_info_grabber(self.model_descr)
        self.update_info(info)
        return info

    def _init_model(self, model, info=None):
        """Initialise parameters for MLP architectures (CNNs defer to fit
        time when the spatial input shape is known)."""
        if info is None:
            info = ModelInfo.get_info_grabber(self.model_descr)
        if info.is_mlp():
            model.init(jax.random.PRNGKey(self.seed), (info.num_inputs(),))
        return model


class MLPModelBuilder(ModelBuilder):
    def build(self):
        net = super().build()
        model = MLPModel(net, train_config=self.train_config)
        return self._init_model(model)


class DeltaUQMLPModelBuilder(ModelBuilder):
    def __init__(self, base_descr, duq_descr, **kwargs):
        super().__init__(base_descr, **kwargs)
        self.duq_descr = duq_descr
        self._updated = False

    def build(self):
        self.update_info(self.get_info())
        net = super().build()
        model = DeltaUQMLP(net, train_config=self.train_config,
                           **self.duq_descr)
        return self._init_model(model)

    def update_info(self, info):
        estimator = self.duq_descr.get('estimator', 'std')
        batch_size = self.duq_descr.get('anchored_batch_size')
        info.get_estimator = lambda: estimator
        info.get_batch_size = lambda: batch_size
        if self._updated:
            return
        self._updated = True
        info.set_num_inputs(2 * info.num_inputs())


class PAGERModelBuilder(ModelBuilder):
    def __init__(self, base_descr, pager_descr, **kwargs):
        super().__init__(base_descr, **kwargs)
        self.pager_descr = pager_descr
        self._updated = False

    def build(self):
        self.update_info(self.get_info())
        net = super().build()
        model = PAGERMLP(net, train_config=self.train_config,
                         **self.pager_descr)
        return self._init_model(model)

    def update_info(self, info):
        estimator = self.pager_descr.get('estimator', 'std')
        info.get_estimator = lambda: estimator
        if self._updated:
            return
        self._updated = True
        info.set_num_inputs(2 * info.num_inputs())


class EnsembleModelBuilder(ModelBuilder):
    def __init__(self, base_descr, ensemble_descr, **kwargs):
        super().__init__(base_descr, **kwargs)
        self.ensemble_descr = ensemble_descr

    def build(self):
        info = self.get_info()
        net = super().build()
        model = EnsembleModel(net, num_models=info.get_num_models(),
                              train_config=self.train_config)
        return self._init_model(model, info)

    def update_info(self, info):
        num_models = self.ensemble_descr['num_models']
        info.get_num_models = lambda: num_models


class MCDropoutModelBuilder(ModelBuilder):
    def __init__(self, base_descr, dropout_descr, **kwargs):
        super().__init__(base_descr, **kwargs)
        self.dropout_descr = dropout_descr

    def build(self):
        self.model_descr = self._add_dropout(self.model_descr, self.dropout_descr)
        net = build_network(self.model_descr)
        model = MCDropoutModel(net, train_config=self.train_config,
                               **self.dropout_descr)
        return self._init_model(model)

    def _add_dropout(self, model_descr, dropout_descr):
        new_model = [model_descr[0]]
        dropout_layer = {'Dropout': {'args': [dropout_descr['dropout_percent']]}}
        for layer in model_descr[1:-1]:
            if layer.get('Linear') or layer.get('Conv2d'):
                new_model.append(copy.deepcopy(dropout_layer))
            new_model.append(layer)
        new_model.append(model_descr[-1])
        return new_model

    def update_info(self, info):
        num_samples = self.dropout_descr['num_samples']
        dropout_percent = self.dropout_descr['dropout_percent']
        info.get_num_samples = lambda: num_samples
        info.get_dropout_percent = lambda: dropout_percent


class MVEModelBuilder(ModelBuilder):
    """Mean-variance estimation: widens the last layer to emit
    ``(mu, raw_sigma)``."""

    def __init__(self, base_descr, mve_descr=None, **kwargs):
        super().__init__(base_descr, **kwargs)
        self.mve_descr = dict(mve_descr or {})
        self._updated = False

    def build(self):
        self.update_info(self.get_info())
        net = super().build()
        return self._init_model(
            MVEMLPModel(net, train_config=self.train_config,
                        **self.mve_descr))

    def update_info(self, info):
        if self._updated:
            return
        self._updated = True
        last = self.model_descr[-1]
        name = list(last.keys())[0]
        last[name]['args'][1] = 2 * last[name]['args'][1]


class KDEModelBuilder(ModelBuilder):
    def __init__(self, base_descr, kde_descr, **kwargs):
        super().__init__(base_descr, **kwargs)
        self.kde_descr = kde_descr

    def build(self):
        net = super().build()
        model = KDEMLPModel(net, **self.kde_descr,
                            train_config=self.train_config)
        return self._init_model(model)


class KNNKDEModelBuilder(ModelBuilder):
    def __init__(self, base_descr, knn_kde_descr, **kwargs):
        super().__init__(base_descr, **kwargs)
        self.knn_kde_descr = knn_kde_descr

    def build(self):
        net = super().build()
        model = KNNKDEMLPModel(net, **self.knn_kde_descr,
                               train_config=self.train_config)
        return self._init_model(model)
