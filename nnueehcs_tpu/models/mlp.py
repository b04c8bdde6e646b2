"""Plain MLP wrapper: passthrough forward, no uncertainty estimate
(reference ``nnueehcs/models.py:182-188``)."""
from __future__ import annotations

from .base import WrappedModelBase


class MLPModel(WrappedModelBase):
    uq_method = 'mlp'

    def __init__(self, net, **kwargs):
        super().__init__(net, **kwargs)

    # eval_output inherited: plain net pass, no UE.
