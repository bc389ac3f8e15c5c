"""Constrained-parameter transforms (Stan-style unconstraining).

The reference evaluates Stan models on Stan's *unconstrained* scale —
`fit.log_prob` applies the change of variables (e.g. ``tau = exp(zeta)``
for ``tau > 0``) and adds the log-Jacobian
(reference: viabel/vb.py:314-321; SURVEY.md section 7 "Matching Stan's
unconstrained-space log densities").  The model zoo hard-codes this for
eight-schools; this module makes the mechanism a first-class, reusable
layer so *any* constrained model can be expressed on the unconstrained
scale the variational families live on:

    log p_unconstrained(z) = log p_constrained(T(z)) + log |dT/dz|

Example — a scale parameter and a correlation::

    t = ParameterTransforms([identity_transform(),       # mu
                             positive_transform(),       # sigma > 0
                             interval_transform(-1, 1)]) # rho in (-1, 1)
    log_density_unc = t.transformed_log_density(log_density_constrained)
    samples_constrained = t.constrain(unconstrained_samples)
"""
import math
from typing import Callable, NamedTuple, Sequence

import jax.numpy as jnp

__all__ = [
    'Transform',
    'identity_transform',
    'positive_transform',
    'lower_bounded_transform',
    'interval_transform',
    'ParameterTransforms',
]


class Transform(NamedTuple):
    """Bijection from an unconstrained scalar to a constrained one.

    `constrain(z)` maps R -> support; `unconstrain(x)` inverts it;
    `log_det_jacobian(z)` is ``log |d constrain / dz|`` (the term Stan adds
    to the target density).
    """
    constrain: Callable
    unconstrain: Callable
    log_det_jacobian: Callable
    name: str


def identity_transform():
    return Transform(lambda z: z, lambda x: x,
                     lambda z: jnp.zeros_like(z), 'identity')


def positive_transform():
    """x = exp(z), for parameters declared ``<lower=0>`` (Stan's choice)."""
    return Transform(jnp.exp, jnp.log, lambda z: z, 'positive')


def lower_bounded_transform(lower):
    """x = lower + exp(z)."""
    return Transform(lambda z: lower + jnp.exp(z),
                     lambda x: jnp.log(x - lower),
                     lambda z: z, 'lower_bounded({})'.format(lower))


def interval_transform(lower, upper):
    """x = lower + (upper - lower) * sigmoid(z)
    (Stan's ``<lower=a, upper=b>`` logit transform)."""
    width = upper - lower

    def constrain(z):
        return lower + width / (1.0 + jnp.exp(-z))

    def unconstrain(x):
        u = (x - lower) / width
        return jnp.log(u) - jnp.log1p(-u)

    def log_det_jacobian(z):
        # log(width) + log sigmoid(z) + log sigmoid(-z)
        return (math.log(width) - jnp.logaddexp(0.0, -z)
                - jnp.logaddexp(0.0, z))

    return Transform(constrain, unconstrain, log_det_jacobian,
                     'interval({}, {})'.format(lower, upper))


class ParameterTransforms:
    """Per-coordinate transforms for a parameter vector.

    `transforms` is one `Transform` per dimension (use
    `identity_transform()` for unconstrained coordinates).
    """

    def __init__(self, transforms: Sequence[Transform]):
        self.transforms = list(transforms)
        self.dim = len(self.transforms)

    def constrain(self, z):
        z = jnp.atleast_2d(z)
        cols = [t.constrain(z[:, d]) for d, t in enumerate(self.transforms)]
        return jnp.stack(cols, axis=-1)

    def unconstrain(self, x):
        x = jnp.atleast_2d(x)
        cols = [t.unconstrain(x[:, d])
                for d, t in enumerate(self.transforms)]
        return jnp.stack(cols, axis=-1)

    def log_det_jacobian(self, z):
        z = jnp.atleast_2d(z)
        return sum(t.log_det_jacobian(z[:, d])
                   for d, t in enumerate(self.transforms))

    def transformed_log_density(self, log_density_constrained):
        """Lift a constrained-space log density to the unconstrained scale
        (the role `fit.log_prob` plays for Stan models in the reference)."""

        def log_density_unconstrained(z):
            z2 = jnp.atleast_2d(z)
            out = (log_density_constrained(self.constrain(z2))
                   + self.log_det_jacobian(z2))
            return out[0] if jnp.ndim(z) == 1 else out

        return log_density_unconstrained
