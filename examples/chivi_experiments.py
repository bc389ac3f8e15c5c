"""CHIVI gradient-variant experiments
(reference: notebooks/chivi_expts.ipynb, chive_expts_3.ipynb — which import
`black_box_chivi_neff` and perturbed-VI helpers from a sibling branch;
SURVEY.md section 2.3): compare plain CHIVI, ESS-normalized CHIVI
(chivi_neff), and perturbed-objective optimization on the robust-regression
posterior, reporting convergence and khat for each."""
import argparse
import sys

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

from viabel_tpu import (adagrad_optimize, black_box_chivi,
                        black_box_chivi_neff, black_box_klvi,
                        init_from_moments, mean_field_t_variational_family,
                        perturbed_black_box_vi)
from viabel_tpu.experiments import get_samples_and_log_weights
from viabel_tpu.models import robust_regression_model
from viabel_tpu.psis import psislw


def main(full=False, n_iters=None, mc_samples=None):
    n_iters = n_iters or (5000 if full else 1000)
    mc_samples = mc_samples or (1000000 if full else 50000)
    model = robust_regression_model()
    fam = mean_field_t_variational_family(2, 40)
    warm = init_from_moments(fam, model.true_mean, 4.0 * model.true_cov)

    runs = [
        ('chivi', black_box_chivi(2, fam, model.log_prob, 500), warm),
        ('chivi_neff', black_box_chivi_neff(2, fam, model.log_prob, 500),
         warm),
        ('perturbed_klvi',
         perturbed_black_box_vi(fam, model.log_prob, 100,
                                perturbation_scale=0.05),
         jnp.zeros(fam.var_param_dim)),
        ('klvi', black_box_klvi(fam, model.log_prob, 100),
         jnp.zeros(fam.var_param_dim)),
    ]
    results = {}
    for i, (name, obj, init) in enumerate(runs):
        opt, _, values, _ = adagrad_optimize(
            n_iters, obj, jnp.asarray(init, dtype=jnp.float32),
            key=jax.random.PRNGKey(i), learning_rate=.01)
        mean, _ = fam.mean_and_cov(opt)
        _, lw = get_samples_and_log_weights(model.log_prob, fam, opt,
                                            mc_samples,
                                            jax.random.PRNGKey(100 + i))
        _, khat = psislw(lw)
        mean_err = float(np.linalg.norm(np.asarray(mean) - model.true_mean))
        print('{:>15}: mean_err = {:.4f}  khat = {:+.3f}  '
              'final loss = {:.4g}'.format(
                  name, mean_err, float(khat),
                  float(np.mean(np.asarray(values)[-50:]))))
        results[name] = dict(mean_err=mean_err, khat=float(khat))
    return results


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--full', action='store_true')
    main(p.parse_args().full)
