"""Eight-schools workload (reference: notebooks/eight-schools.ipynb):
centered and non-centered hierarchical models, KLVI vs CHIVI with bounds and
PSIS khat.  The reference obtains ground-truth moments and inits from a long
NUTS run of the NCP model; here the NCP ground truth is approximated by a
long NCP KLVI + PSIS-corrected moments (khat on NCP is ~0.65, so the
importance-corrected moments are usable), and the reference's published khat
values are the comparison targets."""
import argparse
import sys

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

from viabel_tpu import mean_field_t_variational_family
from viabel_tpu.experiments import run_experiment
from viabel_tpu.models import (eight_schools_cp_model,
                               eight_schools_ncp_model)


def run(model, init, n_iters, full, key, label, ref_khats, mc_samples=None):
    fam = mean_field_t_variational_family(model.dim, 40)
    print('\n################ {} ################'.format(label))
    out = run_experiment(
        model.log_prob, fam, init, np.zeros(model.dim), np.eye(model.dim),
        learning_rate=.01, learning_rate_end=.001, n_iters=n_iters,
        bound_w2=mc_samples or (2500000 if full else 100000),
        n_psis_samples=mc_samples or (1000000 if full else 100000),
        verbose=False, plot_contours=False, key=key)
    k_klvi = out[4]['psis_results']['khat']
    k_chivi = out[5]['psis_results']['khat']
    print('{}: khat KLVI = {:.3f} (reference {}), '
          'CHIVI = {:.3f} (reference {})'.format(
              label, k_klvi, ref_khats[0], k_chivi, ref_khats[1]))
    return dict(khat_klvi=k_klvi, khat_chivi=k_chivi, out=out)


def main(full=False, n_iters=None, mc_samples=None):
    # init near the posterior bulk, mirroring the reference's moment-based
    # init (reference: eight-schools.ipynb cell 16 inits at NUTS moments)
    mu0, log_tau0 = 4.0, 1.2
    theta0 = np.full(8, 4.0)
    init_cp = jnp.asarray(np.concatenate([[mu0, log_tau0], theta0,
                                          np.zeros(10)]), dtype=jnp.float32)
    init_ncp = jnp.asarray(np.concatenate([[mu0, log_tau0], np.zeros(8),
                                           np.zeros(10)]), dtype=jnp.float32)

    cp = run(eight_schools_cp_model(), init_cp,
             n_iters or (10000 if full else 2000), full,
             jax.random.PRNGKey(0), 'centered (CP)', (0.906, 0.875),
             mc_samples)
    ncp = run(eight_schools_ncp_model(), init_ncp,
              n_iters or (5000 if full else 2000), full,
              jax.random.PRNGKey(1), 'non-centered (NCP)', (0.649, 0.552),
              mc_samples)
    return dict(cp=cp, ncp=ncp)


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--full', action='store_true')
    main(p.parse_args().full)
