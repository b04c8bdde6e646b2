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
    """Single-file pickle bundle (default; keeps the ``model.pth``
    contract).  For the directory-based Orbax format use
    :func:`save_model_orbax`."""
    bundle = {
        'format': FORMAT,
        'config': model.config_dict(),
        'arrays': model.arrays_dict(),
    }
    with open(path, 'wb') as f:
        pickle.dump(bundle, f)


def load_model(path: str):
    import os
    if os.path.isdir(path):
        return load_model_orbax(path)
    with open(path, 'rb') as f:
        bundle = pickle.load(f)
    if bundle.get('format') != FORMAT:
        raise ValueError(f'Not a {FORMAT} checkpoint: {path}')
    return build_from_bundle(bundle)


def _split_nones(tree):
    """Orbax stores array pytrees; carve out None leaves (unset buffers)."""
    import jax
    nones = []

    def strip(path, leaf):
        if leaf is None:
            nones.append(path)
            return 0   # placeholder scalar
        return leaf
    stripped = jax.tree_util.tree_map_with_path(
        strip, tree, is_leaf=lambda x: x is None)
    return stripped, [str(p) for p in nones]


def save_model_orbax(model, dirpath: str):
    """Directory checkpoint via Orbax (sharding-aware, async-capable —
    the idiomatic format for large sharded models)."""
    import json
    import os
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    dirpath = os.path.abspath(dirpath)
    arrays = model.arrays_dict()
    stripped, none_paths = _split_nones(arrays)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(dirpath, 'arrays'), stripped, force=True)
    meta = {
        'format': FORMAT + '-orbax',
        'config': model.config_dict(),
        'none_paths': none_paths,
    }
    with open(os.path.join(dirpath, 'model_config.json'), 'w') as f:
        json.dump(meta, f, default=repr)


def load_model_orbax(dirpath: str):
    import json
    import os
    import jax
    import orbax.checkpoint as ocp

    with open(os.path.join(dirpath, 'model_config.json')) as f:
        meta = json.load(f)
    if meta.get('format') != FORMAT + '-orbax':
        raise ValueError(f'Not an orbax {FORMAT} checkpoint: {dirpath}')
    with ocp.StandardCheckpointer() as ckptr:
        arrays = ckptr.restore(os.path.join(os.path.abspath(dirpath),
                                            'arrays'))
    none_paths = set(meta.get('none_paths', []))
    if none_paths:
        arrays = jax.tree_util.tree_map_with_path(
            lambda p, l: None if str(p) in none_paths else l, arrays)
    return build_from_bundle({'format': FORMAT, 'config': meta['config'],
                              'arrays': arrays})


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
