"""Eight-schools workload (reference: notebooks/eight-schools.ipynb):
centered and non-centered hierarchical models, KLVI vs CHIVI with bounds and
PSIS khat.

The reference obtains ground-truth moments — and, crucially, the
*initialization* for both models — from a long NUTS run of the NCP model
(reference: eight-schools.ipynb cells 10-16: `init_param_cp` concatenates
the NUTS means with half-log marginal variances).  Here the same role is
played by a preliminary long NCP KLVI fit whose PSIS-corrected draws
(khat ~ 0.6, so the correction is trustworthy) provide NCP- and CP-scale
moments; both experiments then start from those moments via
`init_from_moments`, matching the reference protocol.
"""
import argparse
import sys

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

from viabel_tpu import (adagrad_optimize, black_box_klvi, init_from_moments,
                        mean_field_t_variational_family)
from viabel_tpu.experiments import run_experiment
from viabel_tpu.models import (eight_schools_cp_model,
                               eight_schools_ncp_model,
                               eight_schools_ncp_to_cp)
from viabel_tpu.psis import psislw


def _estimate_ground_truth(n_iters, n_samples, key):
    """NCP KLVI + PSIS-corrected moments on both parameter scales
    (the reference's NUTS stand-in; see module docstring)."""
    model = eight_schools_ncp_model()
    fam = mean_field_t_variational_family(model.dim, 40)
    init = jnp.asarray(np.concatenate([[4.0, 1.0], np.zeros(8),
                                       np.full(10, 0.5)]), dtype=jnp.float32)
    opt, _, _, _ = adagrad_optimize(n_iters, black_box_klvi(
        fam, model.log_prob, 100), init, key=key, learning_rate=.01,
        learning_rate_end=.001)

    @jax.jit
    def draw(vp, k):
        s = fam.sample(k, vp, n_samples)
        return s, model.log_prob(s) - fam.log_prob(vp, s)

    samples, lw = draw(opt, jax.random.fold_in(key, 1))
    slw, khat = psislw(lw)
    w = jnp.exp(slw - jnp.max(slw))
    w = w / jnp.sum(w)

    def weighted_moments(x):
        mean = jnp.sum(w[:, None] * x, axis=0)
        c = x - mean
        cov = (w[:, None] * c).T @ c
        return np.asarray(mean), np.asarray(cov)

    mean_ncp, cov_ncp = weighted_moments(samples)
    cp_samples = jnp.asarray(eight_schools_ncp_to_cp(np.asarray(samples)))
    mean_cp, cov_cp = weighted_moments(cp_samples)
    return dict(mean_ncp=mean_ncp, cov_ncp=cov_ncp, mean_cp=mean_cp,
                cov_cp=cov_cp, khat=float(khat))


def run(model, init, true_mean, true_cov, n_iters, mc_samples, key, label,
        ref_khats):
    fam = mean_field_t_variational_family(model.dim, 40)
    print('\n################ {} ################'.format(label))
    out = run_experiment(
        model.log_prob, fam, init, true_mean, true_cov,
        learning_rate=.01, learning_rate_end=.001, n_iters=n_iters,
        bound_w2=mc_samples, n_psis_samples=mc_samples,
        verbose=False, plot_contours=False, key=key)
    k_klvi = out[4]['psis_results']['khat']
    k_chivi = out[5]['psis_results']['khat']
    print('{}: khat KLVI = {:.3f} (reference {}), '
          'CHIVI = {:.3f} (reference {})'.format(
              label, k_klvi, ref_khats[0], k_chivi, ref_khats[1]))
    return dict(khat_klvi=k_klvi, khat_chivi=k_chivi, out=out)


def main(full=False, n_iters=None, mc_samples=None):
    mc = mc_samples or (1000000 if full else 100000)
    truth = _estimate_ground_truth(
        n_iters or (10000 if full else 2000), mc,
        jax.random.PRNGKey(42))
    print('ground-truth stage khat = {:.3f}'.format(truth['khat']))
    print('  mu, tau moments: mean = {:.2f}, log_tau = {:.2f}'.format(
        truth['mean_ncp'][0], truth['mean_ncp'][1]))

    fam10 = mean_field_t_variational_family(10, 40)
    init_cp = init_from_moments(fam10, truth['mean_cp'],
                                truth['cov_cp']).astype(jnp.float32)
    init_ncp = init_from_moments(fam10, truth['mean_ncp'],
                                 truth['cov_ncp']).astype(jnp.float32)

    cp = run(eight_schools_cp_model(), init_cp, truth['mean_cp'],
             truth['cov_cp'], n_iters or (10000 if full else 2000), mc,
             jax.random.PRNGKey(0), 'centered (CP)', (0.906, 0.875))
    ncp = run(eight_schools_ncp_model(), init_ncp, truth['mean_ncp'],
              truth['cov_ncp'], n_iters or (5000 if full else 2000), mc,
              jax.random.PRNGKey(1), 'non-centered (NCP)', (0.649, 0.552))
    return dict(cp=cp, ncp=ncp, truth=truth)


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--full', action='store_true')
    main(p.parse_args().full)
