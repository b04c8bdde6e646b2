"""Whole-model checkpointing.

The reference saves the entire Lightning module object with ``torch.save``
(reference ``nnueehcs/training.py:64-65``) so post-hoc tools can rebuild the
model without the original YAML.  Here a checkpoint is a self-contained
bundle: the YAML architecture, the wrapper config, and every learned/fitted
array as numpy — rebuildable with :func:`load_model` alone.

The on-disk filename stays ``model.pth`` to keep the results-tree contract
(reference ``nnueehcs/utility.py:7-14``) byte-compatible for path logic.
"""
from __future__ import annotations

import pickle

FORMAT = 'nnueehcs_tpu-ckpt-v1'


def save_model(model, path: str):
    bundle = {
        'format': FORMAT,
        'config': model.config_dict(),
        'arrays': model.arrays_dict(),
    }
    with open(path, 'wb') as f:
        pickle.dump(bundle, f)


def load_model(path: str):
    with open(path, 'rb') as f:
        bundle = pickle.load(f)
    if bundle.get('format') != FORMAT:
        raise ValueError(f'Not a {FORMAT} checkpoint: {path}')
    return build_from_bundle(bundle)


def build_from_bundle(bundle: dict):
    from ..models import MODEL_CLASSES
    from ..nn.network import build_network

    config = dict(bundle['config'])
    cls = MODEL_CLASSES[config.pop('class')]
    config.pop('uq_method', None)
    architecture = config.pop('architecture')
    net = build_network(architecture)
    model = cls(net, **config)
    model.load_arrays(bundle['arrays'])
    return model
