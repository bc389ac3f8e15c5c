"""Adaptive-HMC sampler tests: conjugate oracle, agreement with the
reference's external Stan-NUTS anchors, and the stored ground-truth
constants (coverage the reference delegates to out-of-repo Stan runs;
reference: notebooks/eight-schools.ipynb cells 10-16,
robust-regression.ipynb cell 9)."""
import jax
import numpy as np
import pytest

from viabel_tpu.mcmc import hmc_ground_truth, hmc_sample
from viabel_tpu.models import (eight_schools_cp_model,
                               eight_schools_ncp_model,
                               eight_schools_ncp_to_cp,
                               linear_regression_model,
                               robust_regression_model)


def _conjugate_model(seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randn(60, 2)
    y = x @ np.array([1.0, -1.0]) + 0.5 * rs.randn(60)
    return linear_regression_model(x, y)


@pytest.mark.slow
def test_hmc_matches_conjugate_posterior():
    model = _conjugate_model()
    gt = hmc_ground_truth(model, key=jax.random.PRNGKey(0), n_samples=4000,
                          n_warmup=1000)
    np.testing.assert_allclose(gt['mean'], model.true_mean, atol=0.01)
    np.testing.assert_allclose(gt['cov'], model.true_cov, rtol=0.1,
                               atol=0.002)
    diag = gt['diagnostics']
    assert 0.5 < diag['accept_rate'] < 1.0
    assert diag['r_hat'].max() < 1.01


def test_hmc_mesh_chains():
    """HMC chains placed on a mesh: deterministic per layout (same mesh ->
    identical draws), statistically equivalent to the unsharded run (the
    Metropolis test amplifies partitioning's ulp-level fusion differences
    into different — equally valid — chain paths, so bitwise equality
    across layouts is not the contract; see hmc_sample's docstring)."""
    from viabel_tpu.parallel import make_mesh
    model = _conjugate_model()
    kw = dict(key=jax.random.PRNGKey(3), n_samples=1500, n_warmup=300,
              n_chains=8)
    plain = hmc_sample(model.log_prob, np.zeros(model.dim), **kw)
    mesh = make_mesh(axis_names=('chain',), shape=(8,))
    sharded = hmc_sample(model.log_prob, np.zeros(model.dim), mesh=mesh,
                         **kw)
    # reproducible for a fixed layout
    again = hmc_sample(model.log_prob, np.zeros(model.dim), mesh=mesh,
                       **kw)
    np.testing.assert_array_equal(sharded['samples'], again['samples'])
    # same stationary distribution: pooled moments agree at MC error, and
    # both runs pass the conjugate oracle
    np.testing.assert_allclose(sharded['mean'], plain['mean'], atol=0.02)
    np.testing.assert_allclose(sharded['mean'], model.true_mean, atol=0.03)
    assert sharded['r_hat'].max() < 1.05
    with pytest.raises(ValueError, match='divide n_chains'):
        hmc_sample(model.log_prob, np.zeros(model.dim), mesh=mesh,
                   n_chains=6)


@pytest.mark.slow
def test_hmc_confirms_robust_regression_notebook_truth():
    """The stored notebook-NUTS moments (models/regression.py) are
    reproduced by the in-repo sampler within MC error."""
    model = robust_regression_model()
    gt = hmc_ground_truth(model, key=jax.random.PRNGKey(1), n_samples=8000,
                          n_warmup=1000, n_chains=4)
    np.testing.assert_allclose(gt['mean'], model.true_mean, atol=0.03)
    np.testing.assert_allclose(gt['cov'], model.true_cov, atol=0.03)


@pytest.mark.slow
def test_hmc_confirms_eight_schools_stored_truth():
    """The shipped _ground_truth.npz constants are reproduced by a fresh
    (smaller) HMC run with a different seed."""
    model = eight_schools_ncp_model()
    cp_model = eight_schools_cp_model()
    gt = hmc_ground_truth(model, key=jax.random.PRNGKey(99), n_samples=8000,
                          n_warmup=1000, n_chains=4,
                          transform=eight_schools_ncp_to_cp)
    np.testing.assert_allclose(gt['mean'], cp_model.true_mean, atol=0.2)
    np.testing.assert_allclose(np.sqrt(np.diag(gt['cov'])),
                               np.sqrt(np.diag(cp_model.true_cov)),
                               rtol=0.06)
    # NCP-scale constants exist and share the (mu, log_tau) block
    np.testing.assert_allclose(model.true_mean[:2], cp_model.true_mean[:2],
                               atol=1e-12)


@pytest.mark.slow
def test_hmc_unconverged_raises():
    """Chains stuck in separate modes of a far-separated mixture trip the
    R-hat gate instead of returning bad moments."""
    import jax.numpy as jnp
    import pytest
    from viabel_tpu.models.base import Model

    def log_prob(x):
        x0 = jnp.atleast_2d(x)[:, 0]
        lp = jnp.logaddexp(-0.5 * (x0 - 100.0) ** 2,
                           -0.5 * (x0 + 100.0) ** 2)
        return lp[0] if jnp.ndim(x) == 1 else lp

    model = Model(log_prob, 1, 'two_islands', None, None, ('x',))
    with pytest.raises(RuntimeError, match='R-hat'):
        hmc_ground_truth(model, key=jax.random.PRNGKey(0), n_samples=200,
                         n_warmup=200, n_chains=6, init_jitter=100.0)


def test_hmc_sample_output_contract():
    model = _conjugate_model()
    out = hmc_sample(model.log_prob, np.zeros(model.dim),
                     key=jax.random.PRNGKey(4), n_samples=200, n_warmup=200,
                     n_chains=3)
    assert out['samples'].shape == (3, 200, model.dim)
    assert out['mean'].shape == (model.dim,)
    assert out['cov'].shape == (model.dim, model.dim)
    assert out['step_size'].shape == (3,)
    assert np.all(out['step_size'] > 0)
    assert np.all(np.isfinite(out['samples']))


@pytest.mark.slow
def test_hmc_anisotropic_preconditioning():
    """The adapted diagonal inverse mass equals the posterior variance
    (M = Sigma^-1, the Stan euclidean metric) — a 100:1 scale ratio
    posterior is recovered accurately (regression test: a round-2 review
    found the adaptation inverted, which anti-preconditioned anisotropic
    targets)."""
    import jax.numpy as jnp

    def log_prob(q):
        q = jnp.atleast_2d(q)
        lp = -0.5 * ((q[:, 0] / 10.0) ** 2 + (q[:, 1] / 0.1) ** 2)
        return lp[0] if jnp.ndim(q) == 1 else lp

    out = hmc_sample(log_prob, np.zeros(2), key=jax.random.PRNGKey(0),
                     n_samples=4000, n_warmup=1000, n_chains=4)
    np.testing.assert_allclose(out['inv_mass'], [100.0, 0.01], rtol=0.25)
    assert out['r_hat'].max() < 1.02
    np.testing.assert_allclose(np.sqrt(np.diag(out['cov'])), [10.0, 0.1],
                               rtol=0.1)
