"""Training subsystem (reference ``nnueehcs/training.py``)."""
from .trainer import Trainer
from .callbacks import EarlyStopping, ModelSavingCallback
from .checkpoint import save_model, load_model
from .data import DataLoader, ArrayDataset
from .hooks import TrainerHook
from .loggers import CSVLogger

__all__ = ['Trainer', 'EarlyStopping', 'ModelSavingCallback', 'save_model',
           'load_model', 'DataLoader', 'ArrayDataset', 'TrainerHook',
           'CSVLogger']
