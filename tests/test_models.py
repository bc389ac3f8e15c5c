"""Model-zoo tests: each JAX log density against an independent scipy
computation, notebook data reproduction, and the external-callback bridge.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from viabel_tpu.models import (EIGHT_SCHOOLS_SIGMA, EIGHT_SCHOOLS_Y,
                               data_generator_linear, eight_schools_cp_model,
                               eight_schools_ncp_model, eight_schools_ncp_to_cp,
                               funnel_model, linear_regression_model,
                               make_callback_log_density,
                               normal_mixture_model, robust_regression_model,
                               robust_regression_notebook_data)


def test_funnel_log_density():
    model = funnel_model()
    x = np.array([[0.5, 1.0], [-1.0, -0.5], [3.0, 2.0]])
    expected = (sps.norm(0, 1.35).logpdf(x[:, 1])
                + sps.norm(0, np.exp(x[:, 1])).logpdf(x[:, 0]))
    np.testing.assert_allclose(model.log_prob(jnp.asarray(x)), expected,
                               rtol=1e-10)
    np.testing.assert_allclose(np.sqrt(np.diag(model.true_cov)),
                               [6.1873, 1.35], atol=1e-3)


def test_normal_mixture_log_density():
    model = normal_mixture_model()
    x = np.linspace(-4, 4, 7)
    expected = np.log(0.5 * sps.norm(-2, 1).pdf(x)
                      + 0.5 * sps.norm(2, 1).pdf(x))
    np.testing.assert_allclose(model.log_prob(jnp.asarray(x)), expected,
                               rtol=1e-10)


def test_robust_regression_notebook_data_reproduction():
    x, y = robust_regression_notebook_data()
    assert x.shape == (25, 2)
    np.testing.assert_allclose(y.mean(), 0.0, atol=1e-12)
    # matches the exact numpy legacy-seed draw of the notebook
    rs = np.random.RandomState(5039)
    x2 = rs.randn(25, 2).dot(np.array([[1, .75], [.75, 1]]))
    np.testing.assert_allclose(x, x2)


def test_robust_regression_log_density():
    model = robust_regression_model()
    x, y = robust_regression_notebook_data()
    beta = np.array([[-2.0, 1.0], [0.0, 0.0], [-2.5245, 1.5185]])
    expected = np.array([
        sps.t(40, loc=x @ b, scale=1.0).logpdf(y).sum()
        + sps.norm(0, 10).logpdf(b).sum()
        for b in beta])
    np.testing.assert_allclose(model.log_prob(jnp.asarray(beta)), expected,
                               rtol=1e-10)
    # single-vector call works too
    np.testing.assert_allclose(model.log_prob(jnp.asarray(beta[0])),
                               expected[0], rtol=1e-10)
    np.testing.assert_allclose(model.true_mean, [-2.5245, 1.5185])


def test_linear_regression_log_density_and_truth():
    data = data_generator_linear(30, 3, rho=0.5, seed=7)
    model = linear_regression_model(data['X'], data['Y'])
    beta = np.array([[0.0, 0.0, 0.0], [1.0, -1.0, 0.5]])
    expected = np.array([
        sps.norm(data['X'] @ b, 0.5).logpdf(data['Y']).sum()
        + sps.norm(0, 10).logpdf(b).sum()
        for b in beta])
    np.testing.assert_allclose(model.log_prob(jnp.asarray(beta)), expected,
                               rtol=1e-10)
    # conjugate truth: posterior mean should be near the generating weights
    np.testing.assert_allclose(model.true_mean, data['W'], atol=0.5)


def test_eight_schools_cp_log_density():
    model = eight_schools_cp_model()
    assert model.dim == 10
    rng = np.random.RandomState(0)
    z = rng.randn(3, 10)
    mu, log_tau, theta = z[:, 0], z[:, 1], z[:, 2:]
    tau = np.exp(log_tau)
    expected = (sps.norm(0, 5).logpdf(mu)
                + sps.cauchy(0, 5).logpdf(tau) + log_tau
                + sps.norm(mu[:, None], tau[:, None]).logpdf(theta).sum(1)
                + sps.norm(theta, EIGHT_SCHOOLS_SIGMA[None, :]).logpdf(
                    EIGHT_SCHOOLS_Y[None, :]).sum(1))
    np.testing.assert_allclose(model.log_prob(jnp.asarray(z)), expected,
                               rtol=1e-10)


def test_eight_schools_ncp_log_density_and_transform():
    model = eight_schools_ncp_model()
    rng = np.random.RandomState(1)
    z = rng.randn(4, 10)
    mu, log_tau, tt = z[:, 0], z[:, 1], z[:, 2:]
    tau = np.exp(log_tau)
    theta = mu[:, None] + tau[:, None] * tt
    expected = (sps.norm(0, 5).logpdf(mu)
                + sps.cauchy(0, 5).logpdf(tau) + log_tau
                + sps.norm(0, 1).logpdf(tt).sum(1)
                + sps.norm(theta, EIGHT_SCHOOLS_SIGMA[None, :]).logpdf(
                    EIGHT_SCHOOLS_Y[None, :]).sum(1))
    np.testing.assert_allclose(model.log_prob(jnp.asarray(z)), expected,
                               rtol=1e-10)

    cp = eight_schools_ncp_to_cp(z)
    np.testing.assert_allclose(cp[:, 2:], theta, rtol=1e-12)
    np.testing.assert_allclose(cp[:, :2], z[:, :2], rtol=1e-12)


def test_models_are_jittable_and_differentiable():
    for model in [funnel_model(), robust_regression_model(),
                  eight_schools_cp_model(), eight_schools_ncp_model()]:
        x = jnp.zeros((5, model.dim), dtype=jnp.float64)
        vals = jax.jit(model.log_prob)(x)
        assert vals.shape == (5,)
        g = jax.grad(lambda z: jnp.sum(model.log_prob(z)))(x)
        assert g.shape == x.shape
        assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow
def test_callback_log_density_matches_native():
    model = robust_regression_model()
    native_grad = jax.grad(lambda z: model.log_prob(z))

    # host-side provider (stands in for a Stan fit object's
    # log_prob/grad_log_prob; reference: viabel/vb.py:314-321)
    host_logp = lambda row: float(model.log_prob(jnp.asarray(row)))
    host_grad = lambda row: np.asarray(native_grad(jnp.asarray(row)))
    wrapped = make_callback_log_density(host_logp, host_grad, model.dim)

    x = np.random.RandomState(2).randn(6, 2)
    np.testing.assert_allclose(wrapped(jnp.asarray(x)),
                               model.log_prob(jnp.asarray(x)), rtol=1e-8)

    # differentiable through an objective-like reduction
    f = lambda z: jnp.mean(wrapped(z))
    g = jax.grad(f)(jnp.asarray(x))
    g_native = jax.grad(lambda z: jnp.mean(model.log_prob(z)))(jnp.asarray(x))
    np.testing.assert_allclose(g, g_native, rtol=1e-8)


def test_native_robust_regression_matches_jax():
    """The C++ robust-regression provider (native/regression.cpp) agrees
    with the pure-JAX model on log densities and reparameterization-path
    gradients (the Stan-bridge role; reference: viabel/vb.py:314-321)."""
    import pytest
    try:
        from viabel_tpu.native import native_robust_regression_log_density
        ld = native_robust_regression_log_density()
    except RuntimeError as e:  # no toolchain in this environment
        pytest.skip(str(e))
    model = robust_regression_model()
    b = jnp.asarray(np.random.RandomState(3).randn(9, 2))
    np.testing.assert_allclose(np.asarray(ld(b)),
                               np.asarray(model.log_prob(b)), rtol=1e-12)
    g_native = jax.grad(lambda p: ld(p[None])[0])(b[0])
    g_jax = jax.grad(lambda p: model.log_prob(p))(b[0])
    np.testing.assert_allclose(np.asarray(g_native), np.asarray(g_jax),
                               rtol=1e-10)
