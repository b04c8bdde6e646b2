"""nnueehcs_tpu — a TPU-native neural-network uncertainty-estimation
evaluation harness for computational science.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference NNUEEHCS harness (PyTorch/Lightning): UQ-wrapped surrogate models
(deep ensembles, MC dropout, KDE / kNN-KDE density scoring, Δ-UQ anchoring,
PAGER), ID/OOD dataset handling, discrimination/cost metric evaluation,
Bayesian-optimization-driven hyperparameter search, and task fan-out —
all built TPU-first: stacked-parameter vmap axes, one jitted program per
trial, Pallas kernels for density scoring, and mesh sharding for scale-out.
"""

__version__ = '0.1.0'

from . import data_utils
from . import model_builder
from . import models
from . import training
from . import ops
from . import evaluation
from . import classification
from . import utility
from . import bo
from . import parallel
from . import datagen
from . import utils
