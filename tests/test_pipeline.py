"""Fused single-dispatch pipeline vs the composed multi-call path.

`validated_vi` must reproduce exactly what `adagrad_optimize` +
`get_samples_and_log_weights` + `all_bounds` + `psislw` +
`improve_with_psis`'s weighted moments produce when given the same keys —
the fusion is a dispatch optimization, not a semantic change.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viabel_tpu import (adagrad_optimize, all_bounds, black_box_chivi,
                        black_box_klvi, mean_field_gaussian_variational_family,
                        mean_field_t_variational_family, validated_vi)
from viabel_tpu.models import funnel_model, robust_regression_model
from viabel_tpu.psis import psislw

N_ITERS = 400
N_BOUND = 20000


def _composed(log_density, fam, obj, init, key, n_bound,
              log_norm_bound=None, **opt_kw):
    opt_key, draw_key = jax.random.split(key)
    opt, _, values, log_norms = adagrad_optimize(
        N_ITERS, obj, init, key=opt_key, **opt_kw)
    samples = fam.sample(draw_key, opt, n_bound)
    lw = log_density(samples) - fam.log_prob(opt, samples)
    bounds = all_bounds(np.asarray(lw),
                        q_var=np.asarray(fam.mean_and_cov(opt)[1]),
                        moment_bound_fn=lambda p: float(fam.pth_moment(opt, p)),
                        log_norm_bound=log_norm_bound)
    slw, khat = psislw(lw)
    w = np.exp(np.asarray(slw))
    s = np.asarray(samples)
    psis_mean = w @ s
    c = s - psis_mean[None, :]
    psis_cov = (w[:, None] * c).T @ c
    return dict(opt_param=opt, value_history=values, bounds=bounds,
                khat=float(khat), psis_mean=psis_mean, psis_cov=psis_cov,
                log_weights=lw, smoothed_log_weights=slw)


def test_matches_composed_path_klvi():
    model = funnel_model()
    fam = mean_field_gaussian_variational_family(model.dim)
    obj = black_box_klvi(fam, model.log_prob, 50)
    init = jnp.zeros(fam.var_param_dim, dtype=jnp.float64)
    key = jax.random.PRNGKey(7)

    out = validated_vi(model.log_prob, fam, init, N_ITERS,
                       objective_and_grad=obj, n_bound_samples=N_BOUND,
                       key=key)
    ref = _composed(model.log_prob, fam, obj, init, key, N_BOUND)

    np.testing.assert_allclose(out['opt_param'], ref['opt_param'],
                               rtol=1e-12)
    np.testing.assert_allclose(out['value_history'], ref['value_history'],
                               rtol=1e-12)
    np.testing.assert_allclose(out['log_weights'], ref['log_weights'],
                               rtol=1e-10)
    np.testing.assert_allclose(out['smoothed_log_weights'],
                               ref['smoothed_log_weights'], rtol=1e-10)
    assert out['khat'] == pytest.approx(ref['khat'], rel=1e-10)
    for k in ('d2', 'W1', 'W2', 'mean_error', 'std_error', 'cov_error',
              'log_norm_bound'):
        assert out['bounds'][k] == pytest.approx(ref['bounds'][k],
                                                 rel=1e-8), k
    np.testing.assert_allclose(out['psis_mean'], ref['psis_mean'],
                               rtol=1e-8)
    np.testing.assert_allclose(out['psis_cov'], ref['psis_cov'],
                               rtol=1e-7, atol=1e-12)


def test_matches_composed_path_chivi_with_log_norm_bound():
    model = robust_regression_model()
    fam = mean_field_t_variational_family(model.dim, 40)
    obj = black_box_chivi(2, fam, model.log_prob, 100)
    init = jnp.concatenate([jnp.asarray(model.true_mean, dtype=jnp.float64),
                            jnp.zeros(model.dim, dtype=jnp.float64)])
    key = jax.random.PRNGKey(3)
    elbo = -1.0  # stand-in KLVI ELBO (any fixed bound must thread through)

    out = validated_vi(model.log_prob, fam, init, N_ITERS,
                       objective_and_grad=obj, n_bound_samples=N_BOUND,
                       key=key, log_norm_bound=elbo)
    ref = _composed(model.log_prob, fam, obj, init, key, N_BOUND,
                    log_norm_bound=elbo)

    np.testing.assert_allclose(out['opt_param'], ref['opt_param'],
                               rtol=1e-12)
    assert out['bounds']['log_norm_bound'] == elbo
    assert out['bounds']['d2'] == pytest.approx(ref['bounds']['d2'],
                                                rel=1e-8)
    assert out['khat'] == pytest.approx(ref['khat'], rel=1e-10)


def test_default_objective_converges_and_caches():
    model = funnel_model()
    fam = mean_field_gaussian_variational_family(model.dim)
    init = jnp.zeros(fam.var_param_dim, dtype=jnp.float64)

    out = validated_vi(model.log_prob, fam, init, 1500, n_mc_samples=50,
                       n_bound_samples=N_BOUND, key=jax.random.PRNGKey(0))
    # converged to the KLVI mean-field solution: centered, with the usual
    # variance underestimate (true log-sigma stdev is 1.35; KLVI mode-seeks)
    q_std = np.sqrt(np.diag(np.asarray(out['q_cov'])))
    assert abs(float(out['q_mean'][0])) < 1.0
    assert 0.3 < q_std[1] < 1.35
    vals = np.asarray(out['value_history'])
    assert vals[-100:].mean() < vals[:100].mean()
    assert out['bounds']['W2'] > 0 and np.isfinite(out['bounds']['d2'])

    # the default-objective factory must be cached: a second call with the
    # same (family, density, n) hits the same objective instance
    from viabel_tpu.pipeline import _default_objective
    assert _default_objective(fam, model.log_prob, 50) is \
        _default_objective(fam, model.log_prob, 50)


def test_mesh_path_matches_composed_sharded_path():
    from viabel_tpu.parallel import (make_mesh, psislw_sharded,
                                     sharded_all_bounds,
                                     sharded_psis_moments)
    mesh = make_mesh(axis_names=('sample',), shape=(8,))
    model = funnel_model()
    fam = mean_field_gaussian_variational_family(model.dim)
    obj = black_box_klvi(fam, model.log_prob, 50)
    init = jnp.zeros(fam.var_param_dim, dtype=jnp.float64)
    key = jax.random.PRNGKey(11)

    out = validated_vi(model.log_prob, fam, init, N_ITERS,
                       objective_and_grad=obj, n_bound_samples=N_BOUND,
                       key=key, mesh=mesh)

    opt_key, draw_key = jax.random.split(key)
    opt, _, _, _ = adagrad_optimize(N_ITERS, obj, init, key=opt_key)
    ref_bounds, lw, samples = sharded_all_bounds(
        model.log_prob, fam, opt, N_BOUND, draw_key, mesh,
        moment_bound_fn=lambda p: float(fam.pth_moment(opt, p)),
        return_log_weights=True, return_samples=True)
    slw, khat = psislw_sharded(lw, mesh)
    psis_mean, psis_cov = sharded_psis_moments(samples, slw, mesh)

    np.testing.assert_allclose(out['opt_param'], opt, rtol=1e-12)
    for k in ('d2', 'W1', 'W2', 'log_norm_bound'):
        assert out['bounds'][k] == pytest.approx(ref_bounds[k],
                                                 rel=1e-8), k
    assert out['khat'] == pytest.approx(float(khat), rel=1e-10)
    np.testing.assert_allclose(out['smoothed_log_weights'], slw,
                               rtol=1e-10)
    np.testing.assert_allclose(out['psis_mean'], psis_mean, rtol=1e-8)
    np.testing.assert_allclose(out['psis_cov'], psis_cov, rtol=1e-7)
    # sharded outputs keep their sharding (nothing gathered to one device)
    assert len(out['log_weights'].sharding.device_set) == 8


def test_alpha_not_2_reports_dalpha_only():
    model = funnel_model()
    fam = mean_field_gaussian_variational_family(model.dim)
    init = jnp.zeros(fam.var_param_dim, dtype=jnp.float64)
    out = validated_vi(model.log_prob, fam, init, 200, n_mc_samples=50,
                       n_bound_samples=5000, alpha=3.0,
                       key=jax.random.PRNGKey(1))
    assert 'dalpha' in out['bounds'] and 'W2' not in out['bounds']
