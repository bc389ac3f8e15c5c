"""Funnel-distribution workload
(reference: notebooks/funnel-distribution.ipynb cell 3): run_experiment
KLVI vs CHIVI with PSIS correction on the 2-D Neal funnel."""
import argparse
import sys

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

from viabel_tpu import mean_field_t_variational_family
from viabel_tpu.experiments import run_experiment
from viabel_tpu.models import funnel_model


def main(full=False, n_iters=None, mc_samples=None):
    model = funnel_model()
    fam = mean_field_t_variational_family(2, 40)
    init = jnp.asarray(np.concatenate([[0.0, -1.0], np.ones(2)]),
                       dtype=jnp.float32)
    out = run_experiment(
        model.log_prob, fam, init, model.true_mean, model.true_cov,
        learning_rate=.01, learning_rate_end=.001,
        n_iters=n_iters or (10000 if full else 2000),
        bound_w2=mc_samples or (1000000 if full else 100000),
        n_psis_samples=mc_samples or (1000000 if full else 100000),
        verbose=True, plot_contours=False, key=jax.random.PRNGKey(0))
    klvi_khat = out[4]['psis_results']['khat']
    chivi_khat = out[5]['psis_results']['khat']
    print('\nkhat KLVI = {:.3f} (reference 0.768), '
          'CHIVI = {:.3f} (reference 0.894)'.format(klvi_khat, chivi_khat))
    return dict(khat_klvi=klvi_khat, khat_chivi=chivi_khat,
                klvi=out[4], chivi=out[5])


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--full', action='store_true')
    main(p.parse_args().full)
