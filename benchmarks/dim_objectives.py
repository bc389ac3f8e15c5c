"""Large-d study for the OTHER two optimizer surfaces (VERDICT r4 item 4).

benchmarks/dim_scaling.py covers full-rank Gaussian KLVI only; this study
runs the remaining optimizer surfaces at d in {100, 300} (full-rank,
P = d(d+3)/2 up to 45,450) on the same conjugate linear-regression
posterior with analytic truth:

* **CHIVI** (the exp-weighted, overflow-prone gradient; reference:
  viabel/vb.py:248-266) — initialized from a KLVI warm fit with the
  reference's ELBO -> log_norm_bound threading (reference:
  notebooks/experiments.py:205-208).  Gates: every value/log-norm in the
  history finite (no overflow in ``exp(lw - max lw)**alpha``), khat and
  d2 certify, steady-state it/s recorded so the occupancy attribution
  (benchmarks/dim_attrib.json: the step is MXU-occupancy / HBM-latency
  bound, not FLOP bound) can be compared across objectives.
* **IA chains** (RMSProp + R-hat-gated averaging; reference:
  viabel/vb.py:392-549) — K vmapped chains at full production d.  Gates:
  finite histories, khat/d2 of the IA-averaged fit, aggregate chain-steps/s
  vs the single-fit adagrad rate (the vmapped batch should be nearly free
  on the under-occupied chip, the same multistart effect dim_attrib
  measured: 8 starts at 1.05x the cost of one).

Writes `dim_objectives.json`; DIM_SCALING.md records the conclusions.

Usage: python benchmarks/dim_objectives.py [--dims 100,300] [--cpu]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _steady(fn, reps=3):
    """Best-of-reps wall clock after a warm/compile call; inputs varied
    per rep (CLAUDE.md timing rules)."""
    jax.block_until_ready(fn(0))
    best = float('inf')
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(r))
        best = min(best, time.perf_counter() - t0)
    return best


def _certify(fam, opt_param, model, n_bound, key):
    """Bound pass + PSIS on a fitted parameter: (khat, d2, mean_err)."""
    from viabel_tpu.bounds import all_bounds, family_moment_bounds
    from viabel_tpu.experiments import get_samples_and_log_weights
    from viabel_tpu.psis import psislw
    _, lw = get_samples_and_log_weights(model.log_prob, fam, opt_param,
                                        n_bound, key)
    res = all_bounds(lw, q_var=np.asarray(fam.mean_and_cov(opt_param)[1]),
                     moment_bound_fn=family_moment_bounds(fam, opt_param))
    _, khat = psislw(lw)
    mean = np.asarray(fam.mean_and_cov(opt_param)[0])
    mean_err = float(np.linalg.norm(mean - model.true_mean))
    return float(khat), float(res['d2']), mean_err


def run_dim(d, n_iters, n_bound, n_chains, key):
    import warnings

    from viabel_tpu import (adagrad_optimize, black_box_chivi,
                            black_box_klvi,
                            full_rank_gaussian_variational_family,
                            init_from_moments,
                            rmsprop_IA_optimize_with_rhat)
    from viabel_tpu.bounds import MonteCarloErrorWarning
    from viabel_tpu.models import (data_generator_linear,
                                   linear_regression_model)
    warnings.simplefilter('ignore', MonteCarloErrorWarning)

    data = data_generator_linear(N=4 * d, D=d, alpha=1.0,
                                 noise_variance=0.25, rho=0.5, seed=7)
    model = linear_regression_model(data['X'], data['Y'], noise_scale=0.5,
                                    prior_std=3.0)
    fam = full_rank_gaussian_variational_family(d)
    init = init_from_moments(
        fam, np.zeros(d), 3.0 ** 2 * np.eye(d)).astype(jnp.float32)
    P = fam.var_param_dim
    print('--- d = {} (P = {}) ---'.format(d, P), flush=True)
    k_klvi, k_chivi, k_ia, k_bound = jax.random.split(key, 4)

    # KLVI warm stage: CHIVI's init and log_norm_bound come from a KLVI
    # fit, the reference's experiment protocol (notebooks/
    # experiments.py:205-208); in-scan draws at d >= 300 (memory, see
    # dim_scaling.py)
    klvi = black_box_klvi(fam, model.log_prob, 100, presampled=d < 300)
    klvi_param, _, klvi_vals, _ = adagrad_optimize(
        n_iters, klvi, init, key=k_klvi, learning_rate=.05,
        learning_rate_end=.001, return_history=False)
    jax.block_until_ready(klvi_param)
    elbo = float(np.mean(np.asarray(klvi_vals)[-max(n_iters // 4, 1):]))

    # --- CHIVI from the KLVI fit ---
    chivi = black_box_chivi(2, fam, model.log_prob, 100,
                            presampled=d < 300)
    n_chivi = n_iters // 2  # refinement stage: half the KLVI schedule

    def chivi_run(r):
        return adagrad_optimize(n_chivi, chivi, klvi_param,
                                key=jax.random.fold_in(k_chivi, r),
                                learning_rate=.01, learning_rate_end=.001,
                                return_history=False)[0]

    t_chivi = _steady(chivi_run)
    chivi_param, _, cvals, clognorms = adagrad_optimize(
        n_chivi, chivi, klvi_param, key=k_chivi, learning_rate=.01,
        learning_rate_end=.001, return_history=False)
    cvals = np.asarray(cvals)
    clognorms = np.asarray(clognorms)
    chivi_finite = bool(np.all(np.isfinite(cvals))
                        and np.all(np.isfinite(clognorms)))
    khat_c, d2_c, merr_c = _certify(fam, chivi_param, model, n_bound,
                                    k_bound)
    chivi_row = dict(objective='chivi', d=d, P=P, n_iters=n_chivi,
                     it_s=n_chivi / t_chivi, all_finite=chivi_finite,
                     max_abs_log_norm=float(np.max(np.abs(clognorms))),
                     khat=khat_c, d2=d2_c, mean_error=merr_c)
    print('CHIVI : {:7.0f} it/s | finite={} | max|log_norm|={:.1f} | '
          'khat {:+.3f} | d2 {:.2e} | mean_err {:.4f}'.format(
              chivi_row['it_s'], chivi_finite,
              chivi_row['max_abs_log_norm'], khat_c, d2_c, merr_c),
          flush=True)

    # --- IA chains (RMSProp + R-hat) ---
    # window=10 caps the retained history at 1000 iterates/chain
    # (100*window); at P = 45450 the full default cap would be ~36 GB
    # across 4 chains
    def ia_run(r):
        return rmsprop_IA_optimize_with_rhat(
            n_iters, klvi, init, model.dim, n_optimisers=n_chains,
            key=jax.random.fold_in(k_ia, r), learning_rate=.01,
            learning_rate_end=.001, window=10, tail_avg_iters=n_iters // 4,
        )[0]

    t_ia = _steady(ia_run, reps=2)
    out = rmsprop_IA_optimize_with_rhat(
        n_iters, klvi, init, model.dim, n_optimisers=n_chains, key=k_ia,
        learning_rate=.01, learning_rate_end=.001, window=10,
        tail_avg_iters=n_iters // 4)
    ia_param = jnp.asarray(out[0])
    ia_vals = np.asarray(out[4])
    ia_finite = bool(np.all(np.isfinite(ia_vals)))
    khat_i, d2_i, merr_i = _certify(fam, ia_param, model, n_bound,
                                    jax.random.fold_in(k_bound, 1))
    ia_row = dict(objective='ia_rmsprop', d=d, P=P, n_iters=n_iters,
                  n_chains=n_chains, it_s=n_iters / t_ia,
                  chain_steps_s=n_chains * n_iters / t_ia,
                  all_finite=ia_finite, khat=khat_i, d2=d2_i,
                  mean_error=merr_i)
    print('IA x{} : {:7.0f} it/s ({:7.0f} chain-steps/s) | finite={} | '
          'khat {:+.3f} | d2 {:.2e} | mean_err {:.4f}'.format(
              n_chains, ia_row['it_s'], ia_row['chain_steps_s'], ia_finite,
              khat_i, d2_i, merr_i), flush=True)
    return [dict(objective='klvi_ref', d=d, P=P, n_iters=n_iters,
                 elbo=elbo), chivi_row, ia_row]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dims', default='100,300')
    p.add_argument('--n-iters', type=int, default=10000)
    p.add_argument('--n-bound', type=int, default=1000000)
    p.add_argument('--n-chains', type=int, default=4)
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--json', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'dim_objectives.json'))
    args = p.parse_args()
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    print('device: {}'.format(jax.devices()[0]), flush=True)
    rows = []
    for d in [int(x) for x in args.dims.split(',')]:
        n_iters = args.n_iters * (4 if d >= 300 else 1)
        rows += run_dim(d, n_iters, args.n_bound, args.n_chains,
                        jax.random.PRNGKey(1000 + d))
        jax.clear_caches()  # vm.max_map_count guard (CLAUDE.md)
    with open(args.json, 'w') as f:
        json.dump(dict(device=str(jax.devices()[0]), rows=rows), f,
                  indent=1)
    print('wrote', args.json)


if __name__ == '__main__':
    main()
