"""Bounds-core tests: analytic Gaussian oracles with MC tolerance.

Same oracle pattern as the reference suite (reference: tests/test_bounds.py)
— closed-form Gaussian alpha-divergences and KL provide expected values,
assertions use tolerances scaled by 1/sqrt(MC_SAMPLES).  Samples are drawn
with `jax.random` (the host CPU in this environment is too slow for scipy's
generators at 1e6+ scale); the normal-mixture parity test keeps the
reference's exact numpy seed-918 draw so its expected values are exact.
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

from viabel_tpu import (all_bounds, divergence_bound, error_bounds,
                        wasserstein_bounds)
from viabel_tpu.distributions import normal_logpdf

# reference-strength statistical power: 1e7 samples, tol 5/sqrt(n) ~ 1.58e-3
# (reference: tests/test_bounds.py:7-8); generation stays in jax.random
MC_SAMPLES = 10000000
MC_TOL = 5 / np.sqrt(MC_SAMPLES)


def _gaussian_samples_and_log_weights(key, var1, var2, n=MC_SAMPLES):
    """x ~ N(0, var2); log_weights = log N(0, var1)(x) - log N(0, var2)(x)."""
    samples = jnp.sqrt(var2) * jax.random.normal(key, (n,), dtype=jnp.float64)
    lw = (normal_logpdf(samples, 0.0, np.sqrt(var1))
          - normal_logpdf(samples, 0.0, np.sqrt(var2)))
    return np.asarray(samples), np.asarray(lw)


def _gaussian_alpha_divergence(alpha, var1, var2):
    """D_alpha(N(0, var1) || N(0, var2)), closed form
    (reference: tests/test_bounds.py:11-17)."""
    tmp = alpha * var2 - (alpha - 1) * var1
    if tmp < 0:
        return np.inf
    return (-0.5 / (alpha - 1) * np.log(tmp)
            + .5 * alpha / (alpha - 1) * np.log(var2) - .5 * np.log(var1))


def _gaussian_kl_divergence(var1, var2):
    return .5 * (var1 / var2 + np.log(var2 / var1) - 1)


def test_divergence_bound():
    var1, var2 = 4, 16
    _, log_weights = _gaussian_samples_and_log_weights(
        jax.random.PRNGKey(846), var1, var2)
    for alpha in [1.5, 2, 3]:
        for elbo in [None, 0]:
            expected = _gaussian_alpha_divergence(alpha, var1, var2)
            if elbo is None:
                expected += alpha / (alpha - 1) * \
                    _gaussian_kl_divergence(var2, var1)
            np.testing.assert_allclose(
                divergence_bound(log_weights, alpha, elbo), expected,
                atol=MC_TOL, rtol=MC_TOL, err_msg='incorrect d_alpha value')


def test_divergence_bound_rejects_bad_alpha():
    with pytest.raises(ValueError):
        divergence_bound(np.zeros(10), alpha=1.0)


def test_all_bounds_rejects_non_2_alpha():
    """The Wasserstein/moment bounds are only valid for the 2-divergence
    (the reference hard-codes alpha=2 in all_bounds)."""
    with pytest.raises(ValueError):
        all_bounds(np.zeros(100), np.zeros(100), alpha=3)


def test_wasserstein_bounds():
    d2 = 5.0
    stdev = 3.5
    samples = stdev * np.asarray(
        jax.random.normal(jax.random.PRNGKey(341), (MC_SAMPLES,),
                          dtype=jnp.float64))
    res = wasserstein_bounds(d2, samples)
    np.testing.assert_allclose(res['W1'], 2 * stdev * np.sqrt(np.expm1(d2)),
                               rtol=MC_TOL, err_msg='incorrect W1 value')
    np.testing.assert_allclose(res['W2'],
                               2 * stdev * (3 * np.expm1(d2)) ** 0.25,
                               rtol=2 * MC_TOL, err_msg='incorrect W2 value')


def test_wasserstein_bounds_moment_fn():
    # With an analytic moment function the bound is exact.
    d2 = 1.0
    var = 4.0
    moment_fn = lambda p: {2: var, 4: 3 * var ** 2}[p]
    res = wasserstein_bounds(d2, moment_bound_fn=moment_fn)
    np.testing.assert_allclose(res['W1'], 2 * np.sqrt(var * np.expm1(d2)))
    np.testing.assert_allclose(
        res['W2'], 2 * (3 * var ** 2) ** 0.25 * np.expm1(d2) ** 0.25)


def test_wasserstein_requires_samples_or_fn():
    with pytest.raises(ValueError):
        wasserstein_bounds(1.0)


def test_wasserstein_bounds_negative_d2_is_finite():
    """A near-exact fit can give a slightly negative MC d2 estimate;
    the bounds must degrade to 0, not NaN (the reference NaNs:
    viabel/bounds.py:124)."""
    moment_fn = lambda p: {2: 4.0, 4: 48.0}[p]
    res = wasserstein_bounds(-1e-4, moment_bound_fn=moment_fn)
    assert res['W1'] == 0.0 and res['W2'] == 0.0


def test_wasserstein_bounds_tiny_positive_d2():
    """exp(-d2) rounds to exactly 1.0 for d2 below ~1e-16; the log-space
    path must still return the (tiny) bound, not raise a math domain
    error."""
    moment_fn = lambda p: {2: 4.0, 4: 48.0}[p]
    res = wasserstein_bounds(1e-17, moment_bound_fn=moment_fn)
    np.testing.assert_allclose(res['W1'], 2 * np.sqrt(4.0 * 1e-17),
                               rtol=1e-12)
    np.testing.assert_allclose(res['W2'], 2 * (48.0 * 1e-17) ** 0.25,
                               rtol=1e-12)
    # for tiny d2 the quartic-root W2 decays slower than the sqrt W1
    assert 0 < res['W1'] < res['W2'] < 1


def test_central_moments_c4_matches_closed_form():
    """Empirical C4 is the norm moment E[||x-mu||^4], agreeing with the
    families' closed-form pth_moment(4).  (The reference's empirical
    fallback drops the cross terms — viabel/bounds.py:135 vs
    viabel/vb.py:177-179 — so its two moment sources disagree in
    dimension > 1; fixed here, see PARITY.md.)"""
    from viabel_tpu import mean_field_gaussian_variational_family
    from viabel_tpu.bounds import central_moments
    d = 5
    fam = mean_field_gaussian_variational_family(d)
    param = jnp.concatenate([jnp.arange(d, dtype=jnp.float64),
                             jnp.linspace(-0.5, 0.5, d)])
    x = fam.sample(jax.random.PRNGKey(7), param, 400000)
    m = central_moments(x)
    np.testing.assert_allclose(float(m['C2']), float(fam.pth_moment(param, 2)),
                               rtol=5e-3)
    np.testing.assert_allclose(float(m['C4']), float(fam.pth_moment(param, 4)),
                               rtol=2e-2)


def test_central_moments_with_cov_flag():
    """``with_cov=False`` omits the covariance — the (d, n) x (n, d) matmul
    is the expensive part of the pass at production sample counts, and its
    result is dead when the caller already holds q_var (round-4 review:
    every serve /bounds and CLI bound-stage call paid it).  C2/C4 are
    identical in both modes."""
    from viabel_tpu.bounds import central_moments
    x = jax.random.normal(jax.random.PRNGKey(3), (2000, 3),
                          dtype=jnp.float64)
    lean = central_moments(x, with_cov=False)
    full = central_moments(x)
    assert 'cov' not in lean
    assert full['cov'].shape == (3, 3)
    np.testing.assert_allclose(float(lean['C2']), float(full['C2']),
                               rtol=1e-12)
    np.testing.assert_allclose(float(lean['C4']), float(full['C4']),
                               rtol=1e-12)


def test_family_moment_bounds_df_guard_narrow_and_cached():
    """Only the families' static df guard maps to the empirical fallback;
    any other ValueError from a custom family's `pth_moment` propagates
    (round-4 review: a blanket except silently converted real defects into
    the fallback).  The df <= 4 verdict is cached per family identity so
    repeated calls skip the failed re-trace (a failed trace is not cached
    by jax.jit)."""
    from viabel_tpu import mean_field_t_variational_family
    from viabel_tpu.bounds import (_families_without_closed_moments,
                                   family_moment_bounds)
    fam = mean_field_t_variational_family(2, df=3.0)  # 2 < df <= 4
    vp = jnp.zeros(4)
    assert family_moment_bounds(fam, vp) is None
    assert fam in _families_without_closed_moments
    assert family_moment_bounds(fam, vp) is None  # cached verdict

    def broken_pth_moment(var_param, p):
        raise ValueError('boom: not the df guard')

    broken = fam._replace(pth_moment=broken_pth_moment)
    with pytest.raises(ValueError, match='boom'):
        family_moment_bounds(broken, vp)


def test_wasserstein_bounds_large_d2_no_overflow_warning():
    """A terrible fit gives a huge d2; the log-space evaluation must not
    emit numpy overflow RuntimeWarnings, stay monotone, and saturate to
    inf only when the bound really exceeds float range."""
    moment_fn = lambda p: {2: 4.0, 4: 48.0}[p]
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        res = wasserstein_bounds(800.0, moment_bound_fn=moment_fn)
        huge = wasserstein_bounds(4000.0, moment_bound_fn=moment_fn)
    np.testing.assert_allclose(res['W1'], 2 * np.exp(0.5 * (np.log(4.0)
                                                            + 800.0)))
    assert res['W2'] < res['W1'] < np.inf
    assert huge['W1'] == np.inf  # exp(~2000) overflows: vacuous bound
    assert huge['W2'] > 0
    # squaring a huge-but-finite W2 saturates to inf, never raises
    eb = error_bounds(W1=res['W1'], W2=res['W1'], q_var=4.0)
    assert eb['cov_error'] == np.inf and eb['mean_error'] == res['W1']


def test_error_bounds_scalar_and_matrix_var():
    res = error_bounds(W1=1.0, W2=2.0, q_var=4.0)
    assert res['mean_error'] == 1.0
    assert res['std_error'] == 2.0
    np.testing.assert_allclose(res['cov_error'], 2 * (2.0 * 2.0 + 4.0))
    # matrix variance reduces via spectral norm (reference: bounds.py:64-67)
    q_cov = np.array([[4.0, 0.0], [0.0, 1.0]])
    res2 = error_bounds(W1=1.0, W2=2.0, q_var=q_cov)
    np.testing.assert_allclose(res2['cov_error'], 2 * (2.0 * 2.0 + 4.0))
    # p_var participates through the min
    res3 = error_bounds(W1=1.0, W2=2.0, q_var=9.0, p_var=1.0)
    np.testing.assert_allclose(res3['cov_error'], 2 * (1.0 * 2.0 + 4.0))


def test_all_bounds():
    var1, var2 = 2.5, 9.3
    samples, log_weights = _gaussian_samples_and_log_weights(
        jax.random.PRNGKey(1639), var1, var2)
    res = all_bounds(log_weights, samples, q_var=var2, log_norm_bound=None)
    expected_d2 = (_gaussian_alpha_divergence(2, var1, var2)
                   + 2 * _gaussian_kl_divergence(var2, var1))
    np.testing.assert_allclose(res['d2'], expected_d2, rtol=MC_TOL,
                               err_msg='incorrect d2 value')
    stdev2 = np.sqrt(var2)
    np.testing.assert_allclose(res['W1'],
                               2 * stdev2 * np.sqrt(np.expm1(res['d2'])),
                               rtol=MC_TOL, err_msg='incorrect W1 value')
    np.testing.assert_allclose(res['W2'],
                               2 * stdev2 * (3 * np.expm1(res['d2'])) ** 0.25,
                               rtol=2 * MC_TOL, err_msg='incorrect W2 value')
    assert set(res) >= {'mean_error', 'std_error', 'cov_error', 'W1', 'W2',
                        'd2', 'log_norm_bound'}


def test_all_bounds_infers_qvar_from_samples():
    n = 200000
    stdev = 2.0
    samples = stdev * np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (n,), dtype=jnp.float64))
    log_weights = np.zeros(n)  # p == q
    res = all_bounds(log_weights, samples)
    # d2 ~ 0 so all bounds collapse toward 0
    assert res['d2'] < 1e-6
    assert res['W2'] < 1e-2


def test_normal_mixture_workload():
    """End-to-end parity check on the normal-mixture workload
    (reference: notebooks/normal-mixture.ipynb cells 2-14).  Expected values
    computed with the reference bounds module on the same numpy seed-918
    draw (matches BASELINE.md W2 = 6.08 / 4.41 / 2.72)."""
    from scipy.special import factorial2
    q_var = 5
    q = norm(scale=np.sqrt(q_var))
    log_q = q.logpdf
    log_p = lambda x: np.logaddexp(norm.logpdf(x, loc=-2),
                                   norm.logpdf(x, loc=2)) - np.log(2)
    np.random.seed(918)
    samples = q.rvs(50000)
    log_weights = log_p(samples) - log_q(samples)

    res1 = all_bounds(log_weights, samples)
    np.testing.assert_allclose(res1['W2'], 6.0836, rtol=1e-3)
    np.testing.assert_allclose(res1['d2'], 0.7681, rtol=1e-3)
    np.testing.assert_allclose(res1['mean_error'], 4.7897, rtol=1e-3)

    res2 = all_bounds(log_weights, samples, q_var=q_var, log_norm_bound=0)
    np.testing.assert_allclose(res2['W2'], 4.4099, rtol=1e-3)
    np.testing.assert_allclose(res2['d2'], 0.2769, rtol=1e-3)

    # machinery parity: feeding the notebook's analytic moment function
    # (normal-mixture.ipynb cell 6) reproduces its published 2.72 — but
    # that function returns the a-th ROOT of the moment where
    # wasserstein_bounds consumes the raw moment E[(x-y)^a]
    # (viabel/bounds.py:118-120), so 2.72 is NOT a valid bound (note it is
    # below the correct W1); see PARITY.md
    mb_ref = lambda order: (factorial2(order - 1) ** (1 / order)
                            * np.sqrt(q_var))
    res3 = all_bounds(log_weights, moment_bound_fn=mb_ref, q_var=q_var)
    np.testing.assert_allclose(res3['W2'], 2.7160, rtol=1e-3)
    np.testing.assert_allclose(res3['mean_error'], 2.7160, rtol=1e-3)

    # with the correct raw moments (C2 = q_var, C4 = 3 q_var^2) the
    # analytic bound must agree with the samples-only empirical one
    mb = lambda order: factorial2(order - 1) * q_var ** (order / 2)
    res4 = all_bounds(log_weights, moment_bound_fn=mb, q_var=q_var)
    np.testing.assert_allclose(res4['W2'], res1['W2'], rtol=2e-2)
    np.testing.assert_allclose(res4['W1'], res1['W1'], rtol=2e-2)
    assert res4['W1'] <= res4['W2']  # valid Wasserstein ordering restored


def test_mc_error_warning_category():
    """Small-sample bound estimates warn with the dedicated
    MonteCarloErrorWarning category at the reference's 0.01-stderr
    threshold (reference: viabel/bounds.py:183-192)."""
    from viabel_tpu.bounds import MonteCarloErrorWarning
    noisy = np.asarray(5.0 * jax.random.normal(jax.random.PRNGKey(11), (50,),
                                               dtype=jnp.float64))
    with pytest.warns(MonteCarloErrorWarning):
        divergence_bound(noisy, alpha=2.0, log_norm_bound=0.0)
