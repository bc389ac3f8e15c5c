"""Harness tests: the full run_experiment workflow end-to-end on the funnel
and conjugate-regression workloads (reference workflow:
notebooks/experiments.py:138-210)."""
import jax
import jax.numpy as jnp
import numpy as np

from viabel_tpu import mean_field_t_variational_family
from viabel_tpu.experiments import (check_accuracy, improve_with_psis,
                                    print_bounds, run_experiment)
from viabel_tpu.models import funnel_model, linear_regression_model


def test_check_accuracy_metrics():
    res = check_accuracy(np.zeros(2), np.eye(2), np.array([3.0, 4.0]),
                         2 * np.eye(2), method='X')
    np.testing.assert_allclose(res['mean_error'], 5.0)
    np.testing.assert_allclose(res['cov_error_2'], 1.0)
    np.testing.assert_allclose(res['cov_error_nuc'], 2.0)
    np.testing.assert_allclose(res['std_error'], np.sqrt(2) * (np.sqrt(2) - 1))
    assert res['method'] == 'X'


def test_run_experiment_funnel_small(capsys):
    model = funnel_model()
    fam = mean_field_t_variational_family(2, 40)
    init = jnp.asarray(np.concatenate([[0.0, -1.0], np.ones(2)]),
                       dtype=jnp.float64)
    out = run_experiment(model.log_prob, fam, init, model.true_mean,
                         model.true_cov, kl_n_samples=50, chivi_n_samples=100,
                         n_iters=400, bound_w2=20000, verbose=True,
                         n_psis_samples=20000, plot_contours=False,
                         key=jax.random.PRNGKey(0))
    klvi, chivi, kl_results, chivi_results, other_kl, other_chivi = out
    assert kl_results['method'] == 'KLVI'
    assert chivi_results['method'] == 'CHIVI'
    # the KLVI ELBO was threaded into CHIVI's bound computation
    assert 'log_norm_bound' in other_kl
    assert other_chivi['log_norm_bound'] == other_kl['log_norm_bound']
    for res in (other_kl, other_chivi):
        assert {'d2', 'W1', 'W2', 'mean_error', 'psis_results'} <= set(res)
        assert np.isfinite(res['psis_results']['khat'])
    captured = capsys.readouterr()
    assert 'KLVI' in captured.out and 'CHIVI' in captured.out
    assert 'khat' in captured.out


def test_improve_with_psis_recovers_moments():
    """PSIS-corrected moments from an imperfect q recover the true posterior
    moments better than q's own moments (the reference's core claim)."""
    rs = np.random.RandomState(0)
    x = rs.randn(60, 2)
    y = x @ np.array([1.0, -1.0]) + 0.5 * rs.randn(60)
    model = linear_regression_model(x, y)
    from viabel_tpu import mean_field_gaussian_variational_family
    fam = mean_field_gaussian_variational_family(2)
    # a deliberately overdispersed approximation centered near the posterior
    var_param = jnp.asarray(np.concatenate([
        model.true_mean + 0.05,
        0.5 * np.log(np.diag(model.true_cov)) + 0.7]))
    res, psis_mean, psis_cov = improve_with_psis(
        model.log_prob, fam, var_param, 200000, model.true_mean,
        model.true_cov, key=jax.random.PRNGKey(1))
    assert res['khat'] < 0.7
    raw_mean_err = np.linalg.norm(
        np.asarray(fam.mean_and_cov(var_param)[0]) - model.true_mean)
    assert res['mean_error'] < raw_mean_err
    np.testing.assert_allclose(psis_mean, model.true_mean, atol=0.02)
    np.testing.assert_allclose(psis_cov, model.true_cov, atol=0.02)


def test_print_bounds(capsys):
    print_bounds(dict(W2=1.0, d2=0.5, mean_error=0.1, std_error=0.2,
                      cov_error=0.3))
    out = capsys.readouterr().out
    assert '2-Wasserstein' in out


def test_improve_with_psis_device_path_matches_numpy():
    """The device fast path (no transform) must equal the host-numpy path
    run through an identity transform."""
    import jax
    from viabel_tpu import mean_field_gaussian_variational_family
    from viabel_tpu.experiments import improve_with_psis
    from viabel_tpu.models import funnel_model

    model = funnel_model()
    fam = mean_field_gaussian_variational_family(2)
    vp = jnp.asarray([0.0, 0.0, 0.3, -0.2], dtype=jnp.float64)
    kw = dict(key=jax.random.PRNGKey(3), verbose=False)
    res_dev, m_dev, c_dev = improve_with_psis(
        model.log_prob, fam, vp, 20000, model.true_mean, model.true_cov,
        **kw)
    res_np, m_np, c_np = improve_with_psis(
        model.log_prob, fam, vp, 20000, model.true_mean, model.true_cov,
        transform=lambda s: s, **kw)
    np.testing.assert_allclose(m_dev, m_np, rtol=1e-10)
    np.testing.assert_allclose(c_dev, c_np, rtol=1e-10, atol=1e-14)
    assert res_dev['khat'] == res_np['khat']
