"""Linear-regression iterate-averaging sweep
(reference: notebooks/linear-regression-model-Iterate-Averaging-rhat.ipynb):
RMSProp/Adam with R-hat-gated iterate averaging across step sizes on a
conjugate target, with PSIS-corrected posterior estimates checked against
the exact posterior from `compute_posterior_moments`."""
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


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--full', action='store_true')
    main(p.parse_args().full)
