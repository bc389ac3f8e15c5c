"""Bayesian regression targets.

* `robust_regression_model`: ``beta ~ N(0, 10); y ~ student_t(df, x beta, 1)``
  (reference: notebooks/robust-regression.ipynb cell 3 inline Stan model).
* `linear_regression_model`: ``beta ~ N(0, 10); y ~ N(x beta, 0.5)``
  (reference: notebooks/linear-regression-model-Iterate-Averaging-rhat.ipynb
  cell 7 inline Stan model).
* `robust_regression_notebook_data`: reproduces the notebook's exact
  seed-5039 synthetic data (reference: notebooks/robust-regression.ipynb
  cell 6) so the BASELINE true posterior moments apply.
* `data_generator_linear`: reconstruction of the correlated-design generator
  the notebooks import from a sibling branch of the fork (absent from the
  reference repo; SURVEY.md section 2.3).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..distributions import normal_logpdf, student_t_logpdf
from .base import Model

__all__ = [
    'robust_regression_model',
    'robust_regression_notebook_data',
    'linear_regression_model',
    'data_generator_linear',
]

# Long-NUTS ground truth for the notebook's seed-5039 data
# (reference: notebooks/robust-regression.ipynb cell 9 output; BASELINE.md).
# Independently confirmed by the in-repo adaptive HMC sampler
# (`viabel_tpu.mcmc`): 8 chains x 20k draws give mean [-2.5255, 1.5222],
# cov [[0.4269, -0.4237], [-0.4237, 0.4419]] — within mutual MC error of
# the notebook's 10-chain NUTS run (tests/test_mcmc.py regenerates the
# check; `python benchmarks/ground_truth.py` reproduces the full run).
_ROBUST_TRUE_MEAN = np.array([-2.5245, 1.5185])
_ROBUST_TRUE_COV = np.array([[0.4328, -0.4301], [-0.4301, 0.4489]])


def robust_regression_notebook_data():
    """The notebook's synthetic data: numpy legacy seed 5039, 25 rows,
    correlated design, t(40) noise, centered response
    (reference: notebooks/robust-regression.ipynb cell 6)."""
    rs = np.random.RandomState(5039)
    beta_gen = np.array([-2.0, 1.0])
    N = 25
    x = rs.randn(N, 2).dot(np.array([[1, .75], [.75, 1]]))
    y_raw = x.dot(beta_gen) + rs.standard_t(40, N)
    y = y_raw - np.mean(y_raw)
    return x, y


def robust_regression_model(x=None, y=None, df=40.0, prior_std=10.0,
                            noise_scale=1.0):
    """Student-t-likelihood regression posterior over coefficients `beta`.

    With no arguments, uses the notebook's exact data so `true_mean` /
    `true_cov` are the reference's NUTS moments.
    """
    use_notebook_truth = x is None and y is None
    if x is None:
        x, y = robust_regression_notebook_data()
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    D = x.shape[1]

    def log_prob(beta):
        beta2 = jnp.atleast_2d(beta)                   # (n, D)
        # f32-pinned: the likelihood the optimizer differentiates
        mu = jnp.matmul(beta2, x.T,
                        precision=jax.lax.Precision.HIGHEST)  # (n, N)
        loglik = jnp.sum(student_t_logpdf(y[None, :], df, mu, noise_scale),
                         axis=-1)
        logprior = jnp.sum(normal_logpdf(beta2, 0.0, prior_std), axis=-1)
        out = loglik + logprior
        return out[0] if jnp.ndim(beta) == 1 else out

    true_mean = _ROBUST_TRUE_MEAN if use_notebook_truth else None
    true_cov = _ROBUST_TRUE_COV if use_notebook_truth else None
    return Model(log_prob, D, 'robust_regression', true_mean, true_cov,
                 tuple('beta[{}]'.format(i) for i in range(D)))


def linear_regression_model(x, y, noise_scale=0.5, prior_std=10.0):
    """Gaussian-likelihood regression posterior over coefficients `beta`.

    Conjugate: the exact posterior is available from
    `viabel_tpu.diagnostics.compute_posterior_moments` with prior covariance
    ``prior_std^2 I`` and noise variance ``noise_scale^2``.
    """
    from ..diagnostics import compute_posterior_moments
    x = np.asarray(x)
    y = np.asarray(y)
    D = x.shape[1]
    true_mean, true_cov = compute_posterior_moments(
        np.zeros(D), prior_std ** 2 * np.eye(D), noise_scale ** 2, x, y)
    xj = jnp.asarray(x)
    yj = jnp.asarray(y)

    def log_prob(beta):
        beta2 = jnp.atleast_2d(beta)
        mu = jnp.matmul(beta2, xj.T,
                        precision=jax.lax.Precision.HIGHEST)
        loglik = jnp.sum(normal_logpdf(yj[None, :], mu, noise_scale), axis=-1)
        logprior = jnp.sum(normal_logpdf(beta2, 0.0, prior_std), axis=-1)
        out = loglik + logprior
        return out[0] if jnp.ndim(beta) == 1 else out

    return Model(log_prob, D, 'linear_regression', true_mean, true_cov,
                 tuple('beta[{}]'.format(i) for i in range(D)))


def data_generator_linear(N, D, alpha=1.0, noise_variance=0.25, rho=0.5,
                          seed=0):
    """Synthetic correlated-design linear-regression data.

    Reconstruction of the `data_generator_linear` the reference notebooks
    import but whose source is absent from the repo
    (reference: notebooks/linear-regression-model-Iterate-Averaging-rhat.ipynb
    cell 4 imports it; SURVEY.md section 2.3).  Design rows are drawn from
    N(0, R) with equicorrelation ``R = (1-rho) I + rho 11^T``, true weights
    ``W ~ N(0, alpha^2 I)``, and ``Y = X W + N(0, noise_variance)``.

    Returns a dict with keys ``X``, ``Y``, ``W``.
    """
    rs = np.random.RandomState(seed)
    R = (1 - rho) * np.eye(D) + rho * np.ones((D, D))
    L = np.linalg.cholesky(R)
    X = rs.randn(N, D) @ L.T
    W = alpha * rs.randn(D)
    Y = X @ W + np.sqrt(noise_variance) * rs.randn(N)
    return dict(X=X, Y=Y, W=W)
