"""Neal-style 2-D funnel (reference: notebooks/funnel-distribution.ipynb
cell 2): ``log_sigma ~ N(0, 1.35); mu ~ N(0, exp(log_sigma))`` with analytic
true moments ``stdevs = [exp(s^2)... , s]``."""
import jax.numpy as jnp
import numpy as np

from ..distributions import normal_logpdf
from .base import Model

__all__ = ['funnel_model']


def funnel_model(log_sigma_stdev=1.35):
    def log_prob(x):
        mu, log_sigma = x[..., 0], x[..., 1]
        sigma_density = normal_logpdf(log_sigma, 0.0, log_sigma_stdev)
        mu_density = normal_logpdf(mu, 0.0, jnp.exp(log_sigma))
        return sigma_density + mu_density

    s = log_sigma_stdev
    true_mean = np.zeros(2)
    true_cov = np.diag(np.array([np.exp(2 * s ** 2), s ** 2]))
    return Model(log_prob, 2, 'funnel', true_mean, true_cov,
                 ('mu', 'log_sigma'))
