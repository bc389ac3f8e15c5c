"""Diagnostics tests: split R-hat against a from-the-formula numpy oracle,
iterate averaging against direct means, and the conjugate-posterior oracle
against a direct linear solve.
"""
import numpy as np
import pytest

from viabel_tpu import (compute_posterior_moments, compute_R_hat,
                        compute_R_hat_adaptive, compute_R_hat_halfway,
                        stochastic_iterate_averaging)


def _rhat_oracle(chains, warmup):
    """Independent numpy implementation of split R-hat from the formula
    (reference semantics: viabel/functions.py:8-31)."""
    chains = chains[:, warmup:, :]
    c, n, K = chains.shape
    n2 = n // 2
    psi = chains[:, :2 * n2, :].reshape(c * 2, n2, K)
    means = psi.mean(axis=1)
    grand = means.mean(axis=0)
    s2 = ((psi - means[:, None, :]) ** 2).sum(axis=1) / (n2 - 1)
    B = n2 * ((means - grand) ** 2).sum(axis=0) / (2 * c - 1)
    W = s2.mean(axis=0) + 1e-8
    var_hat = (n2 - 1) / n2 + B / (n2 * W)
    return np.sqrt(var_hat)


def test_compute_rhat_matches_oracle():
    rng = np.random.RandomState(0)
    chains = rng.randn(4, 1000, 3).cumsum(axis=1) * 0.01 + rng.randn(4, 1, 3)
    for warmup in [0, 100, 500]:
        _, r = compute_R_hat(chains, warmup=warmup)
        np.testing.assert_allclose(r, _rhat_oracle(chains, warmup),
                                   rtol=1e-10)


def test_rhat_mixed_vs_separated_chains():
    rng = np.random.RandomState(1)
    mixed = rng.randn(4, 2000, 2)
    _, r_mixed = compute_R_hat(mixed, warmup=0)
    assert np.all(r_mixed < 1.05)

    separated = mixed + np.arange(4)[:, None, None] * 5.0
    _, r_sep = compute_R_hat(separated, warmup=0)
    assert np.all(r_sep > 1.5)


def test_rhat_adaptive_windows():
    rng = np.random.RandomState(2)
    chains = rng.randn(3, 1000, 2)
    r = compute_R_hat_adaptive(chains, window_size=200)
    assert r.shape == (5, 2)
    # each window equals a direct R-hat on that slice
    _, direct = compute_R_hat(chains[:, :200, :], warmup=0)
    np.testing.assert_allclose(r[0], direct, rtol=1e-10)


def test_rhat_halfway_shapes_and_clamp():
    rng = np.random.RandomState(3)
    chains = rng.randn(2, 600, 2)
    r = compute_R_hat_halfway(chains, interval=100, start=200)
    assert r.shape == (6, 2)
    # the last prefixes clamp at the chain length => identical rows
    np.testing.assert_allclose(r[-1], r[-2], rtol=1e-12)


def test_stochastic_iterate_averaging():
    x = np.arange(20, dtype=float).reshape(-1, 1)
    iters, mean = stochastic_iterate_averaging(x, start=10)
    assert iters.shape == (10, 1)
    np.testing.assert_allclose(iters[0], x[10])
    np.testing.assert_allclose(iters[-1], x[10:].mean())
    np.testing.assert_allclose(mean, x[10:].mean())
    with pytest.raises(ValueError):
        stochastic_iterate_averaging(x, start=25)


def test_effective_sample_size_iid_and_ar1():
    """iid chains give ESS ~ N; AR(1) chains give ESS/N ~ (1-phi)/(1+phi)
    (the theoretical relative efficiency), and the (K,) form vectorizes."""
    import jax
    import jax.numpy as jnp
    from scipy.signal import lfilter
    from viabel_tpu.diagnostics import effective_sample_size

    n_chains, n = 4, 20000
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(0),
                                         (n_chains, n), dtype=jnp.float64))
    ess_iid = effective_sample_size(noise)
    N = n_chains * n
    assert 0.9 * N < ess_iid < 1.1 * N

    phi = 0.7
    ar1 = lfilter([1.0], [1.0, -phi], noise, axis=1)
    ess_ar1 = effective_sample_size(ar1)
    expected = N * (1 - phi) / (1 + phi)
    assert 0.8 * expected < ess_ar1 < 1.2 * expected

    stacked = np.stack([noise, ar1], axis=-1)     # (chains, n, 2)
    ess_k = effective_sample_size(stacked)
    assert ess_k.shape == (2,)
    np.testing.assert_allclose(ess_k, [ess_iid, ess_ar1], rtol=1e-12)

    # Reff for psisloo: iid draws ~ 1, AR(1) well below
    assert ess_ar1 / N < 0.3 < 0.9 < ess_iid / N


def test_effective_sample_size_edge_cases():
    """A constant column inside a batch takes the no-autocorrelation
    branch (ESS = N) without contaminating its neighbors, and the
    single-chain path (no between-chain variance term) works."""
    import jax
    import jax.numpy as jnp
    from viabel_tpu.diagnostics import effective_sample_size

    n_chains, n = 4, 5000
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(3),
                                         (n_chains, n), dtype=jnp.float64))
    stacked = np.stack([noise, np.full((n_chains, n), 2.5)], axis=-1)
    ess = effective_sample_size(stacked)
    assert ess[1] == n_chains * n                     # constant column
    np.testing.assert_allclose(ess[0], effective_sample_size(noise),
                               rtol=1e-12)            # neighbor untouched

    ess_single = effective_sample_size(noise[:1])     # n_chains == 1
    assert 0.8 * n < ess_single < 1.2 * n

    with pytest.raises(ValueError):
        effective_sample_size(noise[:, :3])           # < 4 iterations


def test_effective_sample_size_matches_stan_formulation():
    """Pin the exact Stan/arviz estimator against a direct O(n^2)
    transcription, in particular rho_0 = 1 hard-coded (round-4 review:
    applying the combined-autocorrelation formula at lag 0 gives
    rho_0 = 1 - (W - acov0)/var_plus < 1, underestimating tau and
    inflating every ESS — ~1% on 4x200 iid chains, growing as n
    shrinks)."""
    import jax
    import jax.numpy as jnp
    from scipy.signal import lfilter
    from viabel_tpu.diagnostics import effective_sample_size

    def stan_ess(chains):
        c, n = chains.shape
        acov = np.empty((c, n))
        for j in range(c):
            xc = chains[j] - chains[j].mean()
            for t in range(n):
                acov[j, t] = np.dot(xc[:n - t], xc[t:]) / n
        acov0 = acov[:, 0].mean()
        W = acov0 * n / (n - 1)
        B = np.var(chains.mean(axis=1), ddof=1)
        var_plus = acov0 + B
        rho = 1.0 - (W - acov.mean(axis=0)) / var_plus
        rho[0] = 1.0                      # the Stan/arviz lag-0 convention
        s, prev = 0.0, np.inf
        for k in range(n // 2):
            pair = rho[2 * k] + rho[2 * k + 1]
            if pair <= 0:
                break
            prev = min(pair, prev)
            s += prev
        tau = max(-1.0 + 2.0 * s, 1.0 / np.log10(n + 1))
        return c * n / tau

    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(11), (4, 200),
                                         dtype=jnp.float64))
    ar1 = lfilter([1.0], [1.0, -0.6], noise, axis=1)
    for chains in (noise, ar1):
        np.testing.assert_allclose(effective_sample_size(chains),
                                   stan_ess(chains), rtol=1e-10)


def test_split_rhat_rejects_too_short_chains():
    """Fewer than 4 post-warmup iterations used to divide by zero and
    return NaN/inf R-hat silently, poisoning downstream convergence gates
    (round-4 review); now it raises like `effective_sample_size`."""
    from viabel_tpu.diagnostics import compute_R_hat
    chains = np.random.RandomState(0).randn(2, 503, 3)
    with pytest.raises(ValueError, match='at least 4'):
        compute_R_hat(chains, warmup=500)
    # 4 post-warmup iterations is the minimum and works
    var_hat, r = compute_R_hat(chains, warmup=499)
    assert np.all(np.isfinite(r))


def test_compute_posterior_moments_vs_direct():
    rng = np.random.RandomState(4)
    N, D = 40, 3
    x = rng.randn(N, D)
    w = rng.randn(D)
    noise_var = 0.3
    y = x @ w + np.sqrt(noise_var) * rng.randn(N)
    prior_mean = np.zeros(D)
    prior_cov = 4.0 * np.eye(D)

    mu, S = compute_posterior_moments(prior_mean, prior_cov, noise_var, x, y)
    # direct formula: S = (P0 + X'X/s2)^-1; mu = S (P0 m0 + X'y/s2)
    P0 = np.linalg.inv(prior_cov)
    S_direct = np.linalg.inv(P0 + x.T @ x / noise_var)
    mu_direct = S_direct @ (P0 @ prior_mean + x.T @ y / noise_var)
    np.testing.assert_allclose(S, S_direct, rtol=1e-8)
    np.testing.assert_allclose(mu, mu_direct, rtol=1e-8)
