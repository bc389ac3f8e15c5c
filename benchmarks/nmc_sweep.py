"""n_mc / unroll occupancy sweep at large d (VERDICT r4 item 1).

benchmarks/dim_attrib.py proved the d = 300 full-rank step is MXU-
*occupancy* bound (<0.1 % utilization: the (n_mc, d) x (d, d) transform
matmuls are too small to fill the systolic array, and the O(window * P)
update is HBM-latency work).  That predicts the third mitigation knob the
round-3/4 studies never swept: on an under-occupied chip, raising `n_mc`
(the per-iteration Monte Carlo batch, reference: viabel/vb.py:345-347)
should be nearly FREE in step time while cutting gradient variance
~ 1/n_mc — free statistical efficiency.

This study measures, per (d, unroll, n_mc):

* steady-state optimizer it/s and evals/s (it/s * n_mc);
* the marginal cost of each n_mc doubling (step-time ratio vs n_mc=100);

and, per (d, n_mc), the empirical ELBO-gradient variance at a fixed
parameter (mean coordinate variance over `reps` independent keys),
confirming the ~1/n_mc reduction is realized.

The results set the shipped defaults: `adagrad_optimize(unroll='auto')`
picks the measured-best unroll by P, and DIM_SCALING.md records the
n_mc-vs-wallclock tradeoff so a large-d user sizes n_mc deliberately.

Usage: python benchmarks/nmc_sweep.py [--dims 10,100,300] [--cpu]
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
    """Best-of-reps wall clock after a warm/compile call; inputs varied per
    rep (CLAUDE.md timing rules)."""
    jax.block_until_ready(fn(0))
    best = float('inf')
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(r))
        best = min(best, time.perf_counter() - t0)
    return best


def run_dim(d, n_iters, n_mcs, unrolls, var_reps):
    import warnings

    from viabel_tpu import (adagrad_optimize, black_box_klvi,
                            full_rank_gaussian_variational_family,
                            init_from_moments)
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

    rows = []
    for n_mc in n_mcs:
        # in-scan draws: the presampled (n_iters, n_mc, d) batch would be
        # the memory hog at large n_mc * d (see dim_scaling.py)
        obj = black_box_klvi(fam, model.log_prob, n_mc, presampled=False)
        for unroll in unrolls:
            def run(r, obj=obj, unroll=unroll):
                return adagrad_optimize(
                    n_iters, obj, init, key=jax.random.PRNGKey(r),
                    learning_rate=.05, learning_rate_end=.001,
                    return_history=False, unroll=unroll)[0]
            t = _steady(run)
            it_s = n_iters / t
            rows.append(dict(d=d, P=P, n_mc=n_mc, unroll=unroll, s=t,
                             it_s=it_s, evals_s=it_s * n_mc))
            print('n_mc={:5d} unroll={:2d}: {:7.3f}s = {:7.0f} it/s '
                  '({:.3g} evals/s)'.format(n_mc, unroll, t, it_s,
                                            it_s * n_mc), flush=True)

    # empirical gradient variance vs n_mc at a fixed (prior-init) parameter:
    # mean over coordinates of Var_keys[grad_i]; expected ~ 1/n_mc
    var_rows = []
    for n_mc in n_mcs:
        obj = black_box_klvi(fam, model.log_prob, n_mc, presampled=False)

        @jax.jit
        def grads(key, obj=obj):
            def one(k):
                return obj(init, k)[1]
            return jax.vmap(one)(jax.random.split(key, var_reps))
        g = np.asarray(grads(jax.random.PRNGKey(123 + n_mc)))
        v = float(np.mean(np.var(g, axis=0)))
        var_rows.append(dict(d=d, n_mc=n_mc, mean_grad_var=v))
        print('n_mc={:5d}: mean grad var {:.4e}'.format(n_mc, v),
              flush=True)
    base = var_rows[0]['mean_grad_var'] * var_rows[0]['n_mc']
    for r in var_rows:
        r['var_x_nmc_over_base'] = r['mean_grad_var'] * r['n_mc'] / base
    return rows, var_rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dims', default='10,100,300')
    p.add_argument('--n-iters', type=int, default=1000)
    p.add_argument('--n-mcs', default='100,200,400,800,1600')
    p.add_argument('--unrolls', default='4,8')
    p.add_argument('--var-reps', type=int, default=64)
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--json', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'nmc_sweep.json'))
    args = p.parse_args()
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    print('device: {}'.format(jax.devices()[0]), flush=True)
    all_rows, all_var = [], []
    for d in [int(x) for x in args.dims.split(',')]:
        rows, var_rows = run_dim(
            d, args.n_iters, [int(x) for x in args.n_mcs.split(',')],
            [int(x) for x in args.unrolls.split(',')], args.var_reps)
        all_rows += rows
        all_var += var_rows
        jax.clear_caches()  # vm.max_map_count guard (CLAUDE.md)
    with open(args.json, 'w') as f:
        json.dump(dict(device=str(jax.devices()[0]), n_iters=args.n_iters,
                       rows=all_rows, grad_var=all_var), f, indent=1)
    print('wrote', args.json)


if __name__ == '__main__':
    main()
