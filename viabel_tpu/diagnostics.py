"""Convergence diagnostics and iterate averaging.

TPU-native rebuild of the reference diagnostics module
(reference: viabel/functions.py:8-77, 139-150).  These operate on small
(n_chains, n_iters, P) iterate histories produced by the scan-based
optimizers; they accept numpy or JAX arrays and return numpy arrays, since
they run once per optimization as a host-side post-pass.  The heavy per-window
R-hat computation is expressed as batched array ops (vmap over windows)
rather than Python loops where shapes allow.
"""
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'compute_R_hat',
    'compute_R_hat_adaptive',
    'compute_R_hat_adaptive_numpy',
    'compute_R_hat_halfway',
    'stochastic_iterate_averaging',
    'compute_posterior_moments',
]

_JITTER = 1e-8


def _split_rhat(chains):
    """Split-half potential scale reduction over (n_chains, n_iters, K).

    Each chain is split into two half-chains; between-/within-chain variance
    decomposition gives ``R = sqrt((n-1)/n + B/(nW))``
    (reference: viabel/functions.py:8-31).
    """
    n_chains, n_iters, K = chains.shape
    n_half = n_iters // 2
    psi = chains[:, :2 * n_half, :].reshape(n_chains * 2, n_half, K)
    psi_dot_j = jnp.mean(psi, axis=1)                       # (2c, K)
    psi_dot_dot = jnp.mean(psi_dot_j, axis=0)               # (K,)
    s_j_2 = (jnp.sum((psi - psi_dot_j[:, None, :]) ** 2, axis=1)
             / (n_half - 1))
    B = (n_half * jnp.sum((psi_dot_j - psi_dot_dot) ** 2, axis=0)
         / (n_chains * 2 - 1))
    W = jnp.nanmean(s_j_2, axis=0) + _JITTER
    var_hat = (n_half - 1) / n_half + B / (n_half * W)
    return var_hat, jnp.sqrt(var_hat)


def compute_R_hat(chains, warmup=500):
    """Split R-hat after discarding `warmup` iterations.

    Mirrors the reference (reference: viabel/functions.py:8-31) except that
    an odd post-warmup length drops exactly one trailing iterate (the
    reference drops two due to an off-by-one; reference:
    viabel/functions.py:15-17).  Returns ``(var_hat, R_hat)``, each (K,).
    """
    chains = jnp.asarray(chains)[:, warmup:, :]
    var_hat, r_hat = _split_rhat(chains)
    return np.asarray(var_hat), np.asarray(r_hat)


def compute_R_hat_adaptive(chains, window_size=100):
    """Windowed R-hat: R-hat of each disjoint `window_size` window.

    Returns array (n_windows, K) (reference: viabel/functions.py:44-52).
    """
    chains = jnp.asarray(chains)
    n_chains, n_iters, K = chains.shape
    n_windows = n_iters // window_size
    if n_windows == 0:
        return np.zeros((0, K))
    windows = chains[:, :n_windows * window_size, :].reshape(
        n_chains, n_windows, window_size, K).transpose(1, 0, 2, 3)
    _, r_hats = jax.vmap(_split_rhat)(windows)
    return np.asarray(r_hats)


# Reference-name alias (reference: viabel/functions.py:44).
compute_R_hat_adaptive_numpy = compute_R_hat_adaptive


def compute_R_hat_halfway(chains, interval=100, start=1000):
    """Growing-prefix ("halfway") R-hat.

    For prefixes ``[: start + (i+1) * interval]`` compute split R-hat with
    warmup equal to half the prefix (reference: viabel/functions.py:54-65).
    Prefix lengths clamp at the chain length, as numpy slicing does in the
    reference.
    """
    chains = np.asarray(chains)
    n_chains, n_iters, K = chains.shape
    n_subchains = n_iters // interval
    r_hats = []
    for i in range(n_subchains):
        end = min(start + (i + 1) * interval, n_iters)
        sub = chains[:, :end, :]
        _, r = compute_R_hat(sub, warmup=sub.shape[1] // 2)
        r_hats.append(r)
    return np.asarray(r_hats)


def stochastic_iterate_averaging(estimate, start):
    """Running (Polyak/SWA-style) average of iterates from `start`.

    Returns the full trajectory of running averages plus the final mean
    (reference: viabel/functions.py:68-77; the reference's
    ``raise "string"`` on an invalid start — functions.py:71 — is replaced
    with a proper ValueError).
    """
    estimate = np.asarray(estimate)
    N = estimate.shape[0]
    if N - start <= 0:
        raise ValueError('start of stationary distribution must be lower '
                         'than number of iterates')
    window_lengths = (np.arange(start, N) - start + 1).reshape(-1, 1)
    estimate_iters = np.cumsum(estimate[start:, :], axis=0) / window_lengths
    estimate_mean = estimate_iters[-1]
    return estimate_iters, estimate_mean


def compute_posterior_moments(prior_mean, prior_covariance, noise_variance,
                              x, y):
    """Exact conjugate Bayesian linear-regression posterior (mean, cov).

    Ground-truth oracle for diagnostics experiments
    (reference: viabel/functions.py:139-150), computed with Cholesky solves
    instead of explicit inverses.
    """
    prior_mean = np.asarray(prior_mean)
    prior_covariance = np.asarray(prior_covariance)
    x = np.asarray(x)
    y = np.asarray(y)
    prior_L = np.linalg.cholesky(prior_covariance)
    inv_L = np.linalg.inv(prior_L)
    prior_precision = inv_L.T @ inv_L
    S_precision = prior_precision + x.T @ x * (1.0 / noise_variance)
    a = np.linalg.cholesky(S_precision)
    inv_a = np.linalg.inv(a)
    post_S = inv_a.T @ inv_a
    post_mu = prior_precision @ prior_mean + (1.0 / noise_variance) * x.T @ y
    post_mu = post_S @ post_mu
    return post_mu, post_S
