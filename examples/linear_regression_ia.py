"""Linear-regression iterate-averaging sweeps.

Two reference protocols on the conjugate linear-regression target, both
checked against the exact posterior from `compute_posterior_moments`:

* ``main`` (reference:
  notebooks/linear-regression-model-Iterate-Averaging-rhat.ipynb):
  RMSProp/Adam with R-hat-gated iterate averaging across step sizes, with
  PSIS-corrected posterior estimates.
* ``protocol2`` (reference:
  notebooks/linear-regression-model-Iterate-Averaging-rhat-2.ipynb):
  correlated-design data at N=200, k=20 (seed 5080), comparing (a) plain
  reparameterization KLVI vs the path-gradient variant
  (`black_box_klvi_pd2`, the notebook's "path gradients always give a
  slightly better result" claim) under RMSProp-IA, and (b) full-rank
  RMSProp-IA vs Adam-IA with the notebook's covariance-distance
  raw-vs-IA comparison (cells 60-100).  The notebook's full-rank family
  is ``t_variational_family(k, df=1000000)`` (cell 27) — a Student t so
  heavy in df it is a Gaussian — and the same constructor is used here.
"""
import argparse
import sys

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

from viabel_tpu import (adam_IA_optimize_with_rhat, black_box_klvi,
                        mean_field_gaussian_variational_family,
                        rmsprop_IA_optimize_with_rhat)
from viabel_tpu.experiments import check_accuracy, improve_with_psis
from viabel_tpu.models import data_generator_linear, linear_regression_model


def main(full=False):
    D = 10 if full else 5
    data = data_generator_linear(N=100, D=D, alpha=1.0, noise_variance=0.25,
                                 rho=0.5, seed=42)
    model = linear_regression_model(data['X'], data['Y'])
    fam = mean_field_gaussian_variational_family(D)
    obj = black_box_klvi(fam, model.log_prob, 100)
    init = jnp.zeros(fam.var_param_dim, dtype=jnp.float32)
    n_iters = 20000 if full else 3000
    n_chains = 4

    print('exact posterior mean: {}'.format(
        np.round(model.true_mean, 3)))
    for name, optimizer in [('rmsprop', rmsprop_IA_optimize_with_rhat),
                            ('adam', adam_IA_optimize_with_rhat)]:
        for lr in ([0.1, 0.02, 0.005] if full else [0.02, 0.005]):
            (final, chains, avg_means, avg_sigmas, _, _, log) = optimizer(
                n_iters, obj, init, D, key=jax.random.PRNGKey(0),
                learning_rate=lr, n_optimisers=n_chains,
                rhat_window=max(n_iters // 10, 100),
                tail_avg_iters=n_iters // 4)
            ia_param = jnp.asarray(np.concatenate([avg_means[0][-1],
                                                   avg_sigmas[0][-1]]))
            acc = check_accuracy(model.true_mean, model.true_cov,
                                 *map(np.asarray, fam.mean_and_cov(ia_param)))
            psis_res, _, _ = improve_with_psis(
                model.log_prob, fam, ia_param, 100000, model.true_mean,
                model.true_cov, key=jax.random.PRNGKey(1))
            print('{:>8} lr={:<6} IA-start mean/sigma = {}/{}  '
                  'mean_err = {:.4f}  psis mean_err = {:.4f}  '
                  'khat = {:.2f}'.format(
                      name, lr, log['start_avg_mean_iters'],
                      log['start_avg_sigma_iters'], acc['mean_error'],
                      psis_res['mean_error'], psis_res['khat']))


def _cov_distance(fam, params, true_cov):
    """Per-iterate Frobenius distance between the iterate's covariance and
    the exact posterior covariance, averaged over iterates (the quantity
    the -2 notebook's distance plots show; reference: cells 60, 70)."""
    covs = jax.vmap(lambda p: fam.mean_and_cov(p)[1])(jnp.asarray(params))
    diff = covs.reshape(covs.shape[0], -1) - jnp.ravel(
        jnp.asarray(true_cov, dtype=covs.dtype))
    return float(jnp.mean(jnp.linalg.norm(diff, axis=1)))


def protocol2(full=False, n_iters=None):
    from viabel_tpu import black_box_klvi_pd2, t_variational_family

    N, k = (200, 20) if full else (100, 6)
    n_iters = n_iters or (7000 if full else 1500)
    rhat_window = 500 if full else 200
    data = data_generator_linear(N=N, D=k, alpha=1.0, noise_variance=0.16,
                                 rho=0.5, seed=5080)
    model = linear_regression_model(data['X'], data['Y'])
    print('== protocol 2: N={} k={} rho=0.5 (seed 5080), {} iters =='.format(
        N, k, n_iters))

    # (a) mean-field: plain KLVI vs path-gradient KLVI under RMSProp-IA
    # (reference: -2 notebook cells 28-31 and 29/50)
    mf = mean_field_gaussian_variational_family(k)
    mf_init = jnp.concatenate([jnp.zeros(k), jnp.ones(k)])
    for name, factory in [('klvi', black_box_klvi),
                          ('klvi_pd2', black_box_klvi_pd2)]:
        obj = factory(mf, model.log_prob, 100)
        (_, chains, avg_means, _, _, _, log) = rmsprop_IA_optimize_with_rhat(
            n_iters, obj, mf_init, k, key=jax.random.PRNGKey(0),
            learning_rate=.01, n_optimisers=2, rhat_window=rhat_window,
            tail_avg_iters=n_iters // 3)
        ia_err = float(np.mean(np.abs(avg_means[0][-1] - model.true_mean)))
        raw_err = float(np.mean(np.abs(
            chains[0, log['start_avg_mean_iters']:, :k] - model.true_mean)))
        print('  mf {:>9}: IA-start {}  mean err: raw tail = {:.5f}  '
              'IA = {:.5f}'.format(name, log['start_avg_mean_iters'],
                                   raw_err, ia_err))

    # (b) full-rank (t, df=1e6): RMSProp-IA vs Adam-IA, covariance distance
    # raw-vs-IA (reference: -2 notebook cells 27, 60-70, 90-100)
    fr = t_variational_family(k, df=1000000)
    fr_init = jnp.concatenate([jnp.zeros(k),
                               jnp.ones(fr.var_param_dim - k)])
    fr_lr = .005 if full else .02  # short horizons need the larger step
    fr_obj = black_box_klvi(fr, model.log_prob, 100)  # once: reused objective
    for name, optimizer in [('rmsprop', rmsprop_IA_optimize_with_rhat),
                            ('adam', adam_IA_optimize_with_rhat)]:
        (final, chains, avg_means, avg_sigmas, _, _, log) = optimizer(
            n_iters, fr_obj, fr_init, k,
            key=jax.random.PRNGKey(1), learning_rate=fr_lr, n_optimisers=2,
            rhat_window=rhat_window, tail_avg_iters=n_iters // 3)
        s0 = log['start_avg_sigma_iters']
        # IA trajectory re-assembled in parameter space: averaged mean block
        # + averaged scale block, then covariance distance per iterate
        stride = max((chains.shape[1] - s0) // 200, 1)
        raw = chains[0, s0::stride]
        # the mean/sigma averages start at their own R-hat-gated iterations;
        # align on the common tail (both end at the final iterate)
        n_ia = min(len(avg_means[0]), len(avg_sigmas[0]))
        ia = np.concatenate([avg_means[0][-n_ia:], avg_sigmas[0][-n_ia:]],
                            axis=1)[::stride]
        d_raw = _cov_distance(fr, raw, model.true_cov)
        d_ia = _cov_distance(fr, ia, model.true_cov)
        mean_err = float(np.mean(np.abs(avg_means[0][-1] - model.true_mean)))
        print('  fr {:>8}: IA-start {}  cov dist: raw = {:.5f}  IA = {:.5f}'
              '  IA mean err = {:.5f}'.format(name, s0, d_raw, d_ia,
                                              mean_err))


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--full', action='store_true')
    p.add_argument('--protocol2', action='store_true',
                   help='run only the -2 notebook protocol')
    args = p.parse_args()
    if args.protocol2:
        protocol2(args.full)
    else:
        main(args.full)
        protocol2(args.full)
