"""A small JAX Gaussian process for the BO engine.

Matérn-5/2 ARD kernel, jitted marginal-likelihood optimisation with optax,
and expected improvement evaluated over a Sobol candidate sweep.  Trial
counts are tiny (≤ 60 per experiment — reference BO budget,
``config.yaml:431-432``), so the Cholesky is negligible; everything runs as
one compiled program per fit.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

_JITTER = 1e-6


def _gp_device():
    """The GP runs on the host CPU backend: its matrices are tiny (≤60
    points) but its training-set shape grows every BO trial, so on an
    accelerator every suggestion would pay a fresh (remote) compile for a
    microsecond-scale computation."""
    try:
        return jax.local_devices(backend='cpu')[0]
    except RuntimeError:
        return None


class _on_gp_device:
    def __enter__(self):
        dev = _gp_device()
        self._ctx = jax.default_device(dev) if dev is not None else None
        if self._ctx is not None:
            self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        if self._ctx is not None:
            return self._ctx.__exit__(*exc)
        return False


def _matern52(x1, x2, lengthscales, amplitude):
    d = (x1[:, None, :] - x2[None, :, :]) / lengthscales
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    sqrt5r = jnp.sqrt(5.0) * r
    return amplitude * (1.0 + sqrt5r + 5.0 / 3.0 * r * r) * jnp.exp(-sqrt5r)


def _bounded(raw, lo, hi):
    """Sigmoid-bounded positive hyperparameter — keeps the float32 Cholesky
    well conditioned no matter where the optimiser wanders."""
    return lo + (hi - lo) * jax.nn.sigmoid(raw)


def _unpack(theta, dim):
    lengthscales = _bounded(theta[:dim], 0.03, 5.0)
    amplitude = _bounded(theta[dim], 0.05, 20.0)
    noise = _bounded(theta[dim + 1], 1e-4, 1.0)
    return lengthscales, amplitude, noise


def _nll(theta, x, y):
    n, dim = x.shape
    ls, amp, noise = _unpack(theta, dim)
    k = _matern52(x, x, ls, amp) + (noise + _JITTER) * jnp.eye(n)
    chol = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y)
    return (0.5 * jnp.dot(y, alpha)
            + jnp.sum(jnp.log(jnp.diag(chol)))
            + 0.5 * n * jnp.log(2 * jnp.pi))


@partial(jax.jit, static_argnums=(2,))
def _fit(x, y, steps: int = 200):
    dim = x.shape[1]
    # sigmoid-space inits: lengthscale ≈ 0.3, amplitude ≈ 1, noise ≈ 1e-2
    theta0 = jnp.concatenate([jnp.full((dim,), -2.9),
                              jnp.array([-3.0]),
                              jnp.array([-4.6])])
    opt = optax.adam(0.05)

    def step(carry, _):
        theta, opt_state = carry
        loss, grads = jax.value_and_grad(_nll)(theta, x, y)
        updates, opt_state = opt.update(grads, opt_state)
        theta = optax.apply_updates(theta, updates)
        return (theta, opt_state), loss

    (theta, _), losses = jax.lax.scan(step, (theta0, opt.init(theta0)),
                                      None, length=steps)
    return theta, losses[-1]


@jax.jit
def _posterior(theta, x, y, x_star):
    n, dim = x.shape
    ls, amp, noise = _unpack(theta, dim)
    k = _matern52(x, x, ls, amp) + (noise + _JITTER) * jnp.eye(n)
    chol = jnp.linalg.cholesky(k)
    k_star = _matern52(x_star, x, ls, amp)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y)
    mean = k_star @ alpha
    v = jax.scipy.linalg.solve_triangular(chol, k_star.T, lower=True)
    var = amp - jnp.sum(v * v, axis=0)
    return mean, jnp.maximum(var, 1e-12)


@jax.jit
def _expected_improvement(mean, var, best):
    """EI for *minimisation* of the standardised objective."""
    sigma = jnp.sqrt(var)
    gamma = (best - mean) / sigma
    phi = jnp.exp(-0.5 * gamma * gamma) / jnp.sqrt(2 * jnp.pi)
    cdf = 0.5 * (1 + jax.lax.erf(gamma / jnp.sqrt(2.0)))
    return sigma * (gamma * cdf + phi)


class GaussianProcess:
    """Fit once, then query posterior/EI.  Inputs in [0,1]^d, y standardised
    internally (minimisation convention)."""

    def __init__(self, x: np.ndarray, y: np.ndarray):
        with _on_gp_device():
            self.x = jnp.asarray(x, jnp.float32)
            y = np.asarray(y, np.float64)
            self.y_mean = float(y.mean())
            self.y_std = float(y.std()) or 1.0
            self.y = jnp.asarray((y - self.y_mean) / self.y_std, jnp.float32)
            self.theta, self.final_nll = _fit(self.x, self.y)

    def posterior(self, x_star: np.ndarray):
        with _on_gp_device():
            mean, var = _posterior(self.theta, self.x, self.y,
                                   jnp.asarray(x_star, jnp.float32))
            return (np.asarray(mean) * self.y_std + self.y_mean,
                    np.asarray(var) * self.y_std ** 2)

    def expected_improvement(self, x_star: np.ndarray,
                             best_y: float | None = None) -> np.ndarray:
        """EI toward minimisation.  ``best_y`` overrides the incumbent (in
        the *original* y units) — required for constrained EI, where the
        incumbent must be the best *feasible* observation, not the global
        best."""
        with _on_gp_device():
            mean, var = _posterior(self.theta, self.x, self.y,
                                   jnp.asarray(x_star, jnp.float32))
            if best_y is None:
                best = jnp.min(self.y)
            else:
                best = jnp.asarray((best_y - self.y_mean) / self.y_std,
                                   jnp.float32)
            return np.asarray(_expected_improvement(mean, var, best))
