"""Row-layout (dim-major) model log densities for the fused Pallas kernels.

The fused kernels hand the model a ``(dim_padded, TILE)`` tile with
parameter dims on the sublane axis; these adapters express the zoo models
(viabel_tpu.models) in that layout.  Rows at index >= dim are zero padding
and must be ignored.

Model data (design matrices, observations) cannot be captured as closure
constants on the compiled Pallas path — kernels must receive them as real
inputs — so each factory returns a `RowModel(fn, args)`: `fn(x, *args)`
computes the tile's log densities and `args` are the arrays the kernel
forwards.  Plain callables (no data, like the funnel) are also accepted by
the kernels and treated as ``RowModel(fn, ())``.
"""
import math
from typing import Callable, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ['RowModel', 'funnel_rows', 'regression_rows',
           'eight_schools_cp_rows', 'eight_schools_ncp_rows']

_LOG_2PI = math.log(2.0 * math.pi)


class RowModel(NamedTuple):
    """Row-layout log density plus the data arrays it needs as kernel
    inputs."""
    fn: Callable
    args: Tuple = ()


def _normal_lp(x, loc, scale):
    z = (x - loc) / scale
    return -0.5 * (z * z + _LOG_2PI) - jnp.log(scale)


def funnel_rows(log_sigma_stdev=1.35):
    """Row-layout funnel (see viabel_tpu.models.funnel)."""
    def fn(x):
        mu, log_sigma = x[0, :], x[1, :]
        return (_normal_lp(log_sigma, 0.0, log_sigma_stdev)
                + _normal_lp(mu, 0.0, jnp.exp(log_sigma)))
    return fn


def regression_rows(x_data, y_data, df=None, noise_scale=1.0, prior_std=10.0):
    """Row-layout Student-t (df given) or Gaussian (df None) regression
    (see viabel_tpu.models.regression).  `x_data` is (N, D)."""
    x_np = np.asarray(x_data, np.float32)
    y_np = np.asarray(y_data, np.float32).reshape(-1, 1)
    D = x_np.shape[1]

    def fn(beta_rows, x_arr, y_arr):
        beta = beta_rows[:D, :]                              # (D, T)
        mu = jnp.dot(x_arr, beta, preferred_element_type=jnp.float32)
        resid = (y_arr - mu) / noise_scale
        if df is None:
            loglik = jnp.sum(-0.5 * (resid * resid + _LOG_2PI)
                             - jnp.log(noise_scale), axis=0)
        else:
            lognorm = float(_t_lognorm(df)) - math.log(noise_scale)
            loglik = jnp.sum(
                lognorm - 0.5 * (df + 1.0) * jnp.log1p(resid * resid / df),
                axis=0)
        logprior = jnp.sum(_normal_lp(beta, 0.0, prior_std), axis=0)
        return loglik + logprior
    return RowModel(fn, (x_np, y_np))


def _t_lognorm(df):
    from scipy.special import gammaln
    return (gammaln(0.5 * (df + 1.0)) - gammaln(0.5 * df)
            - 0.5 * np.log(df * np.pi))


def _half_cauchy_with_jacobian(log_tau, scale):
    tau = jnp.exp(log_tau)
    return -jnp.log(jnp.pi * scale * (1.0 + (tau / scale) ** 2)) + log_tau


def eight_schools_cp_rows(y, sigma):
    """Row-layout centered eight-schools
    (see viabel_tpu.models.eight_schools)."""
    y_np = np.asarray(y, np.float32).reshape(-1, 1)
    sigma_np = np.asarray(sigma, np.float32).reshape(-1, 1)
    J = y_np.shape[0]

    def fn(z, y_arr, sigma_arr):
        mu, log_tau, theta = z[0, :], z[1, :], z[2:2 + J, :]
        tau = jnp.exp(log_tau)
        lp = _normal_lp(mu, 0.0, 5.0)
        lp += _half_cauchy_with_jacobian(log_tau, 5.0)
        lp += jnp.sum(_normal_lp(theta, mu[None, :], tau[None, :]), axis=0)
        lp += jnp.sum(_normal_lp(y_arr, theta, sigma_arr), axis=0)
        return lp
    return RowModel(fn, (y_np, sigma_np))


def eight_schools_ncp_rows(y, sigma):
    """Row-layout non-centered eight-schools."""
    y_np = np.asarray(y, np.float32).reshape(-1, 1)
    sigma_np = np.asarray(sigma, np.float32).reshape(-1, 1)
    J = y_np.shape[0]

    def fn(z, y_arr, sigma_arr):
        mu, log_tau, tt = z[0, :], z[1, :], z[2:2 + J, :]
        tau = jnp.exp(log_tau)
        theta = mu[None, :] + tau[None, :] * tt
        lp = _normal_lp(mu, 0.0, 5.0)
        lp += _half_cauchy_with_jacobian(log_tau, 5.0)
        lp += jnp.sum(_normal_lp(tt, 0.0, 1.0), axis=0)
        lp += jnp.sum(_normal_lp(y_arr, theta, sigma_arr), axis=0)
        return lp
    return RowModel(fn, (y_np, sigma_np))
