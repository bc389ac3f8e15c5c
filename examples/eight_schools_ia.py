"""Eight-schools iterate-averaging protocol
(reference: notebooks/eight-schools-iterate-averaging-rhat.ipynb):
RMSProp with R-hat-gated iterate averaging on the centered and non-centered
parameterisations, started from a very good initialisation (the ground-truth
posterior moments), and the notebook's headline question answered in
numbers: does iterate averaging get closer to the truth than the raw
iterates once the chains have converged?

Protocol (reference cells 14-15, 36): mean-field Gaussian family,
KLVI n_mc = 100; CP runs 9000 iters with ``r_mean_threshold = 1.20``,
NCP runs 11000 iters with ``r_mean_threshold = 1.15``; both use
``learning_rate = .01, n_optimisers = 2, tail_avg_iters = 3000``.  The
notebook initialises both models from the CP-scale NUTS moments (cell 14);
here each model is initialised from its own scale's stored HMC moments —
using CP-scale moments for the NCP parameter vector is a notebook quirk,
not part of the method (documented in PARITY.md).

The notebook's outputs are contour/line plots; this script prints the
quantities those plots display: the averaging start iterations (cells
17/41), the R-hat window trajectories for mu / log-tau / thetas (cells
19/30/32), and the post-convergence distance-to-truth of raw iterates vs
the IA trajectory, overall and for the mu / log-tau / theta blocks
(cells 21-28, 43-46).
"""
import argparse
import sys

sys.path.insert(0, '.')

import jax
import numpy as np

from viabel_tpu import (black_box_klvi, init_from_moments,
                        mean_field_gaussian_variational_family,
                        rmsprop_IA_optimize_with_rhat)
from viabel_tpu.models import eight_schools_cp_model, eight_schools_ncp_model


def _l2(err):
    """Per-iterate l2 norm over the parameter axis (the notebook's
    'Distance' quantity), averaged over iterates; scalars reduce to |err|."""
    err = np.atleast_1d(np.asarray(err))
    flat = err.reshape(err.shape[0], -1) if err.ndim > 1 else err[:, None]
    return float(np.mean(np.linalg.norm(flat, axis=1)))


def _block_errors(label, raw_tail, ia_traj, truth):
    """Mean l2 distance to the truth: raw post-convergence iterates vs the
    final iterate average (what the notebook's 'Distance' plots show)."""
    raw = _l2(raw_tail - truth)
    ia = _l2(np.asarray(ia_traj)[-1:] - truth)
    better = 'IA' if ia <= raw else 'raw'
    print('    {:<22} raw tail = {:.4f}   IA final = {:.4f}   ({} better)'
          .format(label, raw, ia, better))
    return ia <= raw


def run_one(label, model, n_iters, r_mean_threshold, tail_avg_iters, key,
            rhat_window=500, n_mc=100):
    K = model.dim
    fam = mean_field_gaussian_variational_family(K)
    obj = black_box_klvi(fam, model.log_prob, n_mc)
    init = init_from_moments(fam, model.true_mean,
                             np.diag(np.diag(model.true_cov)))
    (_, chains, avg_means, avg_sigmas, _, _, log) = \
        rmsprop_IA_optimize_with_rhat(
            n_iters, obj, init, K, key=key, learning_rate=.01,
            n_optimisers=2, r_mean_threshold=r_mean_threshold,
            rhat_window=rhat_window, tail_avg_iters=tail_avg_iters)

    true_mean = np.asarray(model.true_mean)
    true_log_sigma = .5 * np.log(np.diag(np.asarray(model.true_cov)))

    print('\n== {} ({} iters) =='.format(label, n_iters))
    m0, s0 = log['start_avg_mean_iters'], log['start_avg_sigma_iters']
    print('  averaging starts: mean block iter {}, sigma block iter {}'
          .format(m0, s0))
    rhm, rhs = log['r_hat_mean'], log['r_hat_sigma']
    print('  R-hat windows (mean block): mu {}  log_tau {}  theta max {}'
          .format(np.round(rhm[:, 0], 3), np.round(rhm[:, 1], 3),
                  np.round(rhm[:, 2:].max(axis=1), 3)))
    print('  final-window R-hat: mean block max = {:.3f}, '
          'sigma block max = {:.3f}'.format(rhm[-1].max(), rhs[-1].max()))

    # chain 0, post-convergence raw iterates vs the IA trajectory
    raw_mean = chains[0, m0:, :K]
    raw_sig = chains[0, s0:, K:]
    print('  distance to truth (chain 0, iterations since convergence):')
    wins = [
        _block_errors('mean, all params', raw_mean, avg_means[0], true_mean),
        _block_errors('mean, mu', raw_mean[:, 0], avg_means[0][:, 0],
                      true_mean[0]),
        _block_errors('mean, log_tau', raw_mean[:, 1], avg_means[0][:, 1],
                      true_mean[1]),
        _block_errors('mean, thetas', raw_mean[:, 2:], avg_means[0][:, 2:],
                      true_mean[2:]),
        _block_errors('log-sigma, all params', raw_sig, avg_sigmas[0],
                      true_log_sigma),
    ]
    print('  IA at least as close as raw on {}/{} blocks'.format(
        sum(wins), len(wins)))
    return log


def run_full_rank(full=False, n_iters=None):
    """Full-rank Gaussian RMSProp-IA on the CP model (reference:
    notebooks/eight_schools.ipynb cells 10, 22-23: mean-field vs full-rank
    Gaussian `rmsprop_IA_optimize_with_rhat`, 30000 iters, lr .01)."""
    from viabel_tpu import full_rank_gaussian_variational_family

    model = eight_schools_cp_model()
    K = model.dim
    n_iters = n_iters or (30000 if full else 3000)
    fam = full_rank_gaussian_variational_family(K)
    obj = black_box_klvi(fam, model.log_prob, 100)
    init = init_from_moments(fam, model.true_mean, model.true_cov)
    (_, chains, avg_means, avg_sigmas, _, _, log) = \
        rmsprop_IA_optimize_with_rhat(
            n_iters, obj, init, K, key=jax.random.PRNGKey(2),
            learning_rate=.01, n_optimisers=2,
            rhat_window=500 if full else 200,
            tail_avg_iters=n_iters // 3)
    print('\n== eight-schools CP, full-rank Gaussian ({} iters) =='
          .format(n_iters))
    print('  averaging starts: mean block iter {}, scale block iter {}'
          .format(log['start_avg_mean_iters'], log['start_avg_sigma_iters']))
    true_mean = np.asarray(model.true_mean)
    # everything on chain 0 so raw-vs-IA is not confounded with chain
    # identity: raw = chain 0's last recorded iterate, IA = chain 0's
    # averaged mean and scale blocks
    raw_param = np.asarray(chains[0, -1])
    raw_mean, _ = fam.mean_and_cov(raw_param)
    ia_param = np.concatenate([avg_means[0][-1],
                               avg_sigmas[0][-1]]).astype(raw_param.dtype)
    ia_mean, ia_cov = fam.mean_and_cov(ia_param)
    raw_err = float(np.linalg.norm(np.asarray(raw_mean) - true_mean))
    ia_err = float(np.linalg.norm(np.asarray(ia_mean) - true_mean))
    cov_err = float(np.linalg.norm(
        np.asarray(ia_cov) - np.asarray(model.true_cov)))
    print('  mean err (l2): final iterate = {:.4f}   IA = {:.4f}'.format(
        raw_err, ia_err))
    print('  IA cov err (Frobenius, vs HMC truth) = {:.4f}'.format(cov_err))
    return log


def main(full=False, full_rank=False):
    if full_rank:
        run_full_rank(full=full)
        return
    scale = 1 if full else 4  # quick mode: quarter-length runs
    run_one('eight-schools CP', eight_schools_cp_model(),
            n_iters=9000 // scale, r_mean_threshold=1.20,
            tail_avg_iters=3000 // scale, key=jax.random.PRNGKey(0))
    run_one('eight-schools NCP', eight_schools_ncp_model(),
            n_iters=11000 // scale, r_mean_threshold=1.15,
            tail_avg_iters=3000 // scale, key=jax.random.PRNGKey(1))
    run_full_rank(full=full)


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--full', action='store_true',
                   help='reference-scale iteration counts (9000/11000/30000)')
    p.add_argument('--full-rank', action='store_true',
                   help='run only the full-rank Gaussian protocol '
                        '(eight_schools.ipynb cells 22-23)')
    args = p.parse_args()
    main(full=args.full, full_rank=args.full_rank)
