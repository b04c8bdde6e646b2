"""Functional neural-net core."""
from .layers import (LAYER_REGISTRY, Mode, TRAIN_MODE, EVAL_MODE,
                     MC_EVAL_MODE, register_layer)
from .network import Network, LayerBuilder, build_network

__all__ = ['LAYER_REGISTRY', 'Mode', 'TRAIN_MODE', 'EVAL_MODE', 'MC_EVAL_MODE',
           'register_layer', 'Network', 'LayerBuilder', 'build_network']
