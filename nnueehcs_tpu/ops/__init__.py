"""Hot compute ops: KDE/kNN scoring kernels, losses."""
from .losses import LOSS_REGISTRY, get_loss_fn
from .kde import (bandwidth_value, kde_logpdf, kde_logpdf_xla,
                  kde_logpdf_pallas, knn_kde_density, knn_sq_dists)

__all__ = ['LOSS_REGISTRY', 'get_loss_fn', 'bandwidth_value', 'kde_logpdf',
           'kde_logpdf_xla', 'kde_logpdf_pallas', 'knn_kde_density',
           'knn_sq_dists']
