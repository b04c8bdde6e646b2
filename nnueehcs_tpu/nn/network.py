"""Declarative YAML architecture → functional sequential network.

TPU-native counterpart of the reference's ``build_network`` which turned the
same YAML layer list into a ``torch.nn.Sequential`` (reference
``nnueehcs/model_builder.py:30-73``).  The YAML schema is identical::

    - Linear:
        args: [6, 128]
    - BatchNorm1d:
        args: [128]
    - ReLU:
        inplace: true

but the result here is a :class:`Network` of pure ``init``/``apply``
functions whose parameters are pytrees — jit/vmap/grad-composable.
"""
from __future__ import annotations

import copy
import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax

from .layers import LAYER_REGISTRY, Layer, Mode, EVAL_MODE


class LayerBuilder:
    """Name → layer-class lookup over a chain of namespaces.

    Mirrors the reference's ChainMap-based builder (reference
    ``nnueehcs/model_builder.py:10-27``) including its exception re-wrapping
    contract: failures are re-raised with the layer name and arguments
    attached for debuggability.
    """

    def __init__(self, *namespaces):
        self._namespaces = list(namespaces) if namespaces else [LAYER_REGISTRY]

    def __call__(self, name: str, *args, **kwargs):
        cls = None
        for ns in self._namespaces:
            if name in ns:
                cls = ns[name]
                break
        if cls is None:
            raise KeyError(f'Unknown layer type: {name!r}', name, args, kwargs)
        try:
            return _construct_layer(cls, args, kwargs)
        except Exception as e:  # re-wrap with context, like the reference
            raise e.__class__(str(e), name, args, kwargs) from e

    def add_namespace(self, namespace, index=-1):
        if index >= 0:
            self._namespaces.insert(index, namespace)
        else:
            self._namespaces.insert(0, namespace)


def _construct_layer(cls, args: Sequence[Any], kwargs: dict) -> Layer:
    if dataclasses.is_dataclass(cls):
        field_names = [f.name for f in dataclasses.fields(cls)]
        mapped = dict(zip(field_names, args))
        overlap = set(mapped) & set(kwargs)
        if overlap:
            raise TypeError(f'got multiple values for arguments {overlap}')
        mapped.update(kwargs)
        return cls(**mapped)
    return cls(*args, **kwargs)


class Network:
    """A sequential stack of functional layers.

    ``init(key) -> (params, state)`` and
    ``apply(params, state, x, mode, rng) -> (y, new_state)``.

    ``params``/``state`` are tuples (one pytree entry per layer); an extra
    leading axis on every leaf yields a vmapped ensemble.
    """

    def __init__(self, layers: Sequence[Layer], architecture: Optional[list] = None):
        self.layers = tuple(layers)
        # Retain the YAML description so checkpoints can rebuild the network.
        self.architecture = copy.deepcopy(architecture)
        # Mixed-precision compute dtype (e.g. jnp.bfloat16): activations are
        # cast at entry and restored at exit; parameters stay f32 master
        # weights and every Linear/Conv GEMM accumulates in f32 on the MXU.
        # Set via WrappedModelBase.set_precision / trainer ``precision``.
        self.compute_dtype = None

    def __len__(self):
        return len(self.layers)

    def init(self, key, in_shape: Tuple[int, ...]):
        params, state = [], []
        shape = tuple(in_shape)
        for layer in self.layers:
            key, sub = jax.random.split(key)
            p, s, shape = layer.init(sub, shape)
            params.append(p)
            state.append(s)
        return tuple(params), tuple(state)

    def apply(self, params, state, x, mode: Mode = EVAL_MODE, rng=None):
        import jax.numpy as jnp
        cd = getattr(self, 'compute_dtype', None)
        out_dtype = None
        if cd is not None and jnp.issubdtype(x.dtype, jnp.floating) \
                and x.dtype != cd:
            out_dtype = x.dtype
            x = x.astype(cd)
        new_state = []
        for i, layer in enumerate(self.layers):
            layer_rng = None
            if rng is not None and getattr(layer, 'rng_streams', 0):
                layer_rng = jax.random.fold_in(rng, i)
            x, s = layer.apply(params[i], state[i], x, mode, rng=layer_rng)
            new_state.append(s)
        if out_dtype is not None:
            x = x.astype(out_dtype)
        return x, tuple(new_state)

    def has_state(self, state) -> bool:
        return any(jax.tree_util.tree_leaves(s) for s in state)

    def uses_dropout_rng(self) -> bool:
        return any(getattr(l, 'rng_streams', 0) for l in self.layers)


def build_network(architecture: list, builder: Optional[LayerBuilder] = None) -> Network:
    """YAML layer list → :class:`Network`.

    Each block is a single-key dict ``{LayerName: {args: [...], kw: v}}``;
    ``None`` bodies are treated as empty kwargs — the same contract as the
    reference builder (reference ``nnueehcs/model_builder.py:64-73``).
    """
    if builder is None:
        builder = LayerBuilder(LAYER_REGISTRY)
    layers = []
    arch_descr = copy.deepcopy(architecture)
    architecture = copy.deepcopy(architecture)
    for block in architecture:
        assert len(block) == 1
        name, kwargs = list(block.items())[0]
        if kwargs is None:
            kwargs = {}
        args = kwargs.pop('args', [])
        layers.append(builder(name, *args, **kwargs))
    return Network(layers, architecture=arch_descr)
