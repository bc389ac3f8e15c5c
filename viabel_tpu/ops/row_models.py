"""Row-layout (dim-major) model log densities for the fused Pallas kernel.

`fused_gaussian_lw_stats` hands the model a ``(dim_padded, TILE)`` tile with
parameter dims on the sublane axis; these adapters express the zoo models
(viabel_tpu.models) in that layout.  Rows at index >= dim are zero padding
and must be ignored.
"""
import math

import jax.numpy as jnp

__all__ = ['funnel_rows', 'regression_rows', 'eight_schools_cp_rows',
           'eight_schools_ncp_rows']

_LOG_2PI = math.log(2.0 * math.pi)


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
    x_data = jnp.asarray(x_data, jnp.float32)
    y_data = jnp.asarray(y_data, jnp.float32)
    D = x_data.shape[1]

    def fn(beta_rows):
        beta = beta_rows[:D, :]                              # (D, T)
        mu = jnp.dot(x_data, beta, preferred_element_type=jnp.float32)
        resid = (y_data[:, None] - mu) / noise_scale
        if df is None:
            loglik = jnp.sum(-0.5 * (resid * resid + _LOG_2PI)
                             - jnp.log(noise_scale), axis=0)
        else:
            from jax.scipy.special import gammaln
            lognorm = (gammaln(0.5 * (df + 1.0)) - gammaln(0.5 * df)
                       - 0.5 * jnp.log(df * jnp.pi) - jnp.log(noise_scale))
            loglik = jnp.sum(
                lognorm - 0.5 * (df + 1.0) * jnp.log1p(resid * resid / df),
                axis=0)
        logprior = jnp.sum(_normal_lp(beta, 0.0, prior_std), axis=0)
        return loglik + logprior
    return fn


def _half_cauchy_with_jacobian(log_tau, scale):
    tau = jnp.exp(log_tau)
    return -jnp.log(jnp.pi * scale * (1.0 + (tau / scale) ** 2)) + log_tau


def eight_schools_cp_rows(y, sigma):
    """Row-layout centered eight-schools
    (see viabel_tpu.models.eight_schools)."""
    y = jnp.asarray(y, jnp.float32)
    sigma = jnp.asarray(sigma, jnp.float32)
    J = y.shape[0]

    def fn(z):
        mu, log_tau, theta = z[0, :], z[1, :], z[2:2 + J, :]
        tau = jnp.exp(log_tau)
        lp = _normal_lp(mu, 0.0, 5.0)
        lp += _half_cauchy_with_jacobian(log_tau, 5.0)
        lp += jnp.sum(_normal_lp(theta, mu[None, :], tau[None, :]), axis=0)
        lp += jnp.sum(_normal_lp(y[:, None], theta, sigma[:, None]), axis=0)
        return lp
    return fn


def eight_schools_ncp_rows(y, sigma):
    """Row-layout non-centered eight-schools."""
    y = jnp.asarray(y, jnp.float32)
    sigma = jnp.asarray(sigma, jnp.float32)
    J = y.shape[0]

    def fn(z):
        mu, log_tau, tt = z[0, :], z[1, :], z[2:2 + J, :]
        tau = jnp.exp(log_tau)
        theta = mu[None, :] + tau[None, :] * tt
        lp = _normal_lp(mu, 0.0, 5.0)
        lp += _half_cauchy_with_jacobian(log_tau, 5.0)
        lp += jnp.sum(_normal_lp(tt, 0.0, 1.0), axis=0)
        lp += jnp.sum(_normal_lp(y[:, None], theta, sigma[:, None]), axis=0)
        return lp
    return fn
