"""1-D two-component Gaussian mixture
(reference: notebooks/normal-mixture.ipynb cell 2):
``p = 0.5 N(-2, 1) + 0.5 N(2, 1)``."""
import jax.numpy as jnp
import numpy as np

from ..distributions import normal_logpdf
from .base import Model

__all__ = ['normal_mixture_model']


def normal_mixture_model(locs=(-2.0, 2.0), scale=1.0):
    """1-D mixture density.

    Shape convention (deliberately looser than the multivariate zoo's
    ``(dim,) -> scalar``): `log_prob` is ELEMENTWISE over a 1-D input —
    ``(n,)`` is a batch of n scalar points returning ``(n,)``, exactly the
    reference notebook's scalar-workload semantics (normal-mixture.ipynb
    cell 2, where densities map over sample vectors).  A ``(n, 1)``
    family-shaped batch also returns ``(n,)``.  For the strict
    single-point contract use `mcmc._scalar_log_prob`, which reshapes any
    model's output to ``()``.
    """
    locs = np.asarray(locs, dtype=float)

    def log_prob(x):
        x1 = x[..., 0] if jnp.ndim(x) > 1 else x
        return jnp.logaddexp(normal_logpdf(x1, locs[0], scale),
                             normal_logpdf(x1, locs[1], scale)) - jnp.log(2.0)

    # moments of the symmetric mixture: mean 0, var = scale^2 + loc^2
    true_mean = np.array([locs.mean()])
    true_var = scale ** 2 + np.mean((locs - locs.mean()) ** 2)
    return Model(log_prob, 1, 'normal_mixture', true_mean,
                 np.array([[true_var]]), ('x',))
