"""Model container: a batched log density plus metadata."""
from typing import Callable, NamedTuple, Optional, Tuple

import numpy as np

__all__ = ['Model']


class Model(NamedTuple):
    """A target distribution for variational inference.

    `log_prob` maps a batch of unconstrained parameter vectors ``(n, dim)``
    (or a single ``(dim,)`` vector) to log densities ``(n,)`` (or scalar).
    It may be unnormalized.  `true_mean` / `true_cov` carry ground-truth
    posterior moments when known (analytic or long-NUTS estimates from the
    reference notebooks) for accuracy checks
    (reference: notebooks/experiments.py:26-48).
    """
    log_prob: Callable
    dim: int
    name: str
    true_mean: Optional[np.ndarray] = None
    true_cov: Optional[np.ndarray] = None
    param_names: Tuple[str, ...] = ()

    def __call__(self, x):
        return self.log_prob(x)
