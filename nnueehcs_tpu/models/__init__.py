"""UQ model wrappers (reference ``nnueehcs/models.py``)."""
from .base import WrappedModelBase, training_defaults
from .mlp import MLPModel
from .ensemble import EnsembleModel
from .mc_dropout import MCDropoutModel
from .kde import KDEMLPModel, KNNKDEMLPModel
from .delta_uq import DeltaUQMLP
from .pager import PAGERMLP
from .mve import MVEMLPModel

MODEL_CLASSES = {
    'MVEMLPModel': MVEMLPModel,
    'MLPModel': MLPModel,
    'EnsembleModel': EnsembleModel,
    'MCDropoutModel': MCDropoutModel,
    'KDEMLPModel': KDEMLPModel,
    'KNNKDEMLPModel': KNNKDEMLPModel,
    'DeltaUQMLP': DeltaUQMLP,
    'PAGERMLP': PAGERMLP,
}

__all__ = ['WrappedModelBase', 'MLPModel', 'EnsembleModel', 'MCDropoutModel',
           'KDEMLPModel', 'KNNKDEMLPModel', 'DeltaUQMLP', 'PAGERMLP',
           'MVEMLPModel', 'MODEL_CLASSES', 'training_defaults']
