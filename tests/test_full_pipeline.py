"""Whole-stack correctness: full-rank Gaussian VI on a conjugate Gaussian
posterior must recover the EXACT posterior (the strongest end-to-end test
the problem admits), with bounds collapsing toward zero and khat small.
Also covers `init_from_moments` and the sharded PSIS-corrected moments.
"""
import jax
import jax.numpy as jnp
import numpy as np

from viabel_tpu import (adagrad_optimize, all_bounds, black_box_klvi,
                        full_rank_gaussian_variational_family,
                        init_from_moments, mean_field_t_variational_family,
                        t_variational_family)
from viabel_tpu.experiments import (get_samples_and_log_weights,
                                    improve_with_psis,
                                    improve_with_psis_sharded)
from viabel_tpu.models import linear_regression_model
from viabel_tpu.parallel import make_mesh
from viabel_tpu.psis import psislw
import pytest


def _problem(seed=0, D=3):
    rs = np.random.RandomState(seed)
    x = rs.randn(60, D)
    y = x @ rs.randn(D) + 0.5 * rs.randn(60)
    return linear_regression_model(x, y)


def test_init_from_moments():
    model = _problem()
    for fam in [mean_field_t_variational_family(3, 40),
                full_rank_gaussian_variational_family(3),
                t_variational_family(3, 50)]:
        p = init_from_moments(fam, model.true_mean, model.true_cov)
        mean, cov = fam.mean_and_cov(p)
        np.testing.assert_allclose(np.asarray(mean), model.true_mean,
                                   rtol=1e-10)
        if fam.name == 'full_rank_gaussian':
            np.testing.assert_allclose(np.asarray(cov), model.true_cov,
                                       rtol=1e-8)
        else:
            # t families inflate by df/(df-2); diagonal structure only for mf
            assert np.all(np.isfinite(np.asarray(cov)))
    import pytest
    with pytest.raises(ValueError):
        init_from_moments(full_rank_gaussian_variational_family(3),
                          np.zeros(2), np.eye(2))


def test_full_rank_vi_recovers_exact_posterior():
    """Gaussian posterior + full-rank Gaussian family: KL optimum is the
    exact posterior; d2 -> 0, khat strongly negative, bounds tiny."""
    model = _problem()
    fam = full_rank_gaussian_variational_family(model.dim)
    obj = black_box_klvi(fam, model.log_prob, 100)
    # start away from the solution
    init = init_from_moments(fam, np.zeros(model.dim),
                             4.0 * np.eye(model.dim))
    opt_param, _, values, _ = adagrad_optimize(
        4000, obj, init, key=jax.random.PRNGKey(0), learning_rate=.05,
        learning_rate_end=.005)

    mean, cov = map(np.asarray, fam.mean_and_cov(opt_param))
    np.testing.assert_allclose(mean, model.true_mean, atol=0.02)
    np.testing.assert_allclose(cov, model.true_cov, atol=0.02)

    _, lw = get_samples_and_log_weights(model.log_prob, fam, opt_param,
                                        200000, jax.random.PRNGKey(1))
    res = all_bounds(np.asarray(lw), q_var=cov,
                     moment_bound_fn=lambda p: float(
                         fam.pth_moment(opt_param, p)))
    assert res['d2'] < 0.05
    assert res['mean_error'] < 1.0
    _, khat = psislw(lw)
    assert float(khat) < 1 / 3  # essentially exact importance distribution


@pytest.mark.slow
def test_sharded_psis_correction_matches_local():
    model = _problem()
    fam = full_rank_gaussian_variational_family(model.dim)
    var_param = init_from_moments(
        fam, model.true_mean + 0.05,
        1.5 * model.true_cov)
    mesh = make_mesh(axis_names=('sample',), shape=(8,))
    n = 160000

    res_sh, mean_sh, cov_sh = improve_with_psis_sharded(
        model.log_prob, fam, var_param, n, model.true_mean, model.true_cov,
        mesh, key=jax.random.PRNGKey(2))
    assert res_sh['khat'] < 0.7
    np.testing.assert_allclose(mean_sh, model.true_mean, atol=0.02)
    np.testing.assert_allclose(cov_sh, model.true_cov, atol=0.02)
