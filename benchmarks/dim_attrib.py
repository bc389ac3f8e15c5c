"""Attribute the d=300 optimizer step time (VERDICT r3 item 3).

benchmarks/DIM_SCALING.md measured the d = 300 full-rank pipeline at
808 it/s and stopped at "tracks the raw optimizer cost".  This study turns
that curve into a cause: it decomposes one windowed-adagrad iteration at
large d into its three components, each timed as its own compiled
`lax.scan` at the same iteration count, plus a profiler-trace device/wall
split of the full run:

* **objective** — the KLVI value+gradient: the (n_mc, d) x (d, d) family
  transform matmul, the model log-density, and their VJPs;
* **update** — the windowed-adagrad machinery on the P = d(d+3)/2
  parameter vector: ring-buffer insert, masked min-rescale, the
  sum-of-squares reduction, and the parameter update (all O(window * P)
  elementwise/reduction work, no MXU);
* **scan overhead** — full step minus the two components.

It then measures the two mitigations the round-3 review asked for:

* **unroll sweep** — `adagrad_optimize(unroll=...)` in {1, 2, 4, 8};
* **batched multistart** — K independent optimizer runs vmapped into one
  scan (the `validated_vi_multistart` layout): if the single run leaves
  the chip idle (tiny (100, d) x (d, d) matmuls cannot fill the MXU, and
  O(P) elementwise work is HBM-bound), aggregate evals/s should rise with
  K until the chip saturates.

Writes benchmarks/dim_attrib.json; DIM_SCALING.md carries the conclusions.

Usage: python benchmarks/dim_attrib.py [--d 300] [--iters 1000] [--cpu]
"""
import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _steady(fn, reps=3):
    """Best-of-reps wall clock after a warm/compile call; inputs varied per
    rep (CLAUDE.md timing rules: the remote execution service caches
    results for repeated identical inputs)."""
    jax.block_until_ready(fn(0))
    best = float('inf')
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(r))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--d', type=int, default=300)
    p.add_argument('--iters', type=int, default=1000)
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--json', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'dim_attrib.json'))
    args = p.parse_args()
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    import warnings

    from viabel_tpu import (adagrad_optimize, black_box_klvi,
                            full_rank_gaussian_variational_family,
                            init_from_moments)
    from viabel_tpu.bounds import MonteCarloErrorWarning
    from viabel_tpu.models import (data_generator_linear,
                                   linear_regression_model)
    from viabel_tpu.optimizers import (_wrap_objective, _window_accum,
                                       _WindowState, learning_rate_schedule)
    warnings.simplefilter('ignore', MonteCarloErrorWarning)

    d, n_iters, n_mc, window = args.d, args.iters, 100, 10
    data = data_generator_linear(N=4 * d, D=d, alpha=1.0,
                                 noise_variance=0.25, rho=0.5, seed=7)
    model = linear_regression_model(data['X'], data['Y'], noise_scale=0.5,
                                    prior_std=3.0)
    fam = full_rank_gaussian_variational_family(d)
    obj = _wrap_objective(
        black_box_klvi(fam, model.log_prob, n_mc, presampled=False), None)
    init = init_from_moments(
        fam, np.zeros(d), 3.0 ** 2 * np.eye(d)).astype(jnp.float32)
    P = fam.var_param_dim
    dev = jax.devices()[0]
    print('device: {}; d = {} (P = {}); {} iterations per timing'.format(
        dev, d, P, n_iters), flush=True)
    results = dict(device=str(dev), d=d, P=P, n_iters=n_iters)

    # --- full step at unroll=1: the attribution baseline.  The component
    # scans below are plain (unroll=1) scans, so the subtraction is only
    # meaningful against the same-unroll full step; unroll>1 changes the
    # objective's own speed (cross-iteration fusion) and is measured
    # separately in the mitigation sweep. ---
    def full_run(r, unroll=1):
        return adagrad_optimize(n_iters, obj, init,
                                key=jax.random.PRNGKey(r),
                                learning_rate=.05, learning_rate_end=.001,
                                return_history=False, unroll=unroll)[0]
    t_full = _steady(full_run)
    print('full step (unroll=1): {:7.3f}s = {:6.0f} it/s'.format(
        t_full, n_iters / t_full), flush=True)

    # --- device/wall split from a profiler trace of the same run ---
    device_s = None
    try:
        import tempfile

        from viabel_tpu.utils import profile_trace, trace_device_time
        trace_dir = tempfile.mkdtemp(prefix='viabel_dim_attrib_')
        with profile_trace(trace_dir):
            jax.block_until_ready(full_run(99))
        device_s = trace_device_time(trace_dir)
        print('  trace: {:.3f}s device of {:.3f}s wall ({:.0%} device; '
              'rest is dispatch/host)'.format(
                  device_s, t_full, device_s / t_full), flush=True)
    except Exception as e:
        print('  trace unavailable: {}'.format(e), flush=True)

    # --- component A: objective-only scan (value+grad, no update) ---
    # the param carry takes a negligible O(P) perturbation from the
    # gradient so XLA cannot hoist the objective out of the loop
    @partial(jax.jit, static_argnames=())
    def obj_only(key):
        def step(param, i):
            v, g, ln = obj(param, jax.random.fold_in(key, i))
            return param - 1e-20 * g, v
        _, vs = jax.lax.scan(step, init, jnp.arange(n_iters))
        return jnp.sum(vs)
    t_obj = _steady(lambda r: obj_only(jax.random.PRNGKey(r)))
    print('objective alone     : {:7.3f}s = {:6.0f} it/s'.format(
        t_obj, n_iters / t_obj), flush=True)

    # --- component B: update-only scan (fixed grad, no objective) ---
    g0 = jnp.linspace(0.5, 1.5, P, dtype=jnp.float32)

    @jax.jit
    def update_only(g_scale):
        wstate0 = _WindowState(jnp.zeros((window, P), jnp.float32),
                               jnp.zeros((window,), jnp.float32))

        def step(carry, i):
            param, wstate = carry
            # grad varies per iteration (depends on i) so the window
            # arithmetic cannot be constant-folded
            grad = g0 * (g_scale + 1e-6 * i.astype(jnp.float32))
            log_norm = 1e-7 * i.astype(jnp.float32)
            wstate, accum = _window_accum(wstate, i, grad, log_norm, window)
            lr = learning_rate_schedule(i, n_iters, .05, .001).astype(
                jnp.float32)
            param = param - lr * grad / jnp.sqrt(0.1 + accum)
            return (param, wstate), None
        (param, _), _ = jax.lax.scan(step, (init, wstate0),
                                     jnp.arange(n_iters))
        return jnp.sum(param)
    t_upd = _steady(lambda r: update_only(jnp.float32(1.0 + 0.01 * r)))
    t_scan = t_full - t_obj - t_upd
    print('update alone        : {:7.3f}s = {:6.0f} it/s'.format(
        t_upd, n_iters / t_upd), flush=True)
    print('residual (scan/fuse): {:7.3f}s ({:+.0%} of full)'.format(
        t_scan, t_scan / t_full), flush=True)
    results['attribution'] = dict(
        full_s=t_full, objective_s=t_obj, update_s=t_upd,
        residual_s=t_scan, device_s=device_s,
        objective_frac=t_obj / t_full, update_frac=t_upd / t_full)

    # --- mitigation 1: unroll sweep ---
    rows = []
    for unroll in (1, 2, 4, 8):
        t_u = _steady(lambda r: full_run(r, unroll=unroll))
        rows.append(dict(unroll=unroll, s=t_u, it_s=n_iters / t_u))
        print('unroll={:2d}: {:7.3f}s = {:6.0f} it/s'.format(
            unroll, t_u, n_iters / t_u), flush=True)
    results['unroll_sweep'] = rows

    # --- mitigation 2: batched multistart filling the chip ---
    from viabel_tpu.optimizers import _adagrad_run

    @partial(jax.jit, static_argnames='k_starts')
    def batched(inits, keys, k_starts):
        def one(i, k):
            return _adagrad_run.__wrapped__(
                obj, n_iters, window, .05, 0.1, .001, i, k, False, 4,
                keep_history=False)[2]
        return jax.vmap(one)(inits, keys)

    rows = []
    for k_starts in (1, 2, 4, 8):
        inits = jnp.tile(init[None, :], (k_starts, 1))

        def run(r, k_starts=k_starts, inits=inits):
            keys = jax.vmap(jax.random.PRNGKey)(
                jnp.arange(k_starts) + r * 100)
            return batched(inits, keys, k_starts)
        t_k = _steady(run)
        agg = k_starts * n_iters / t_k
        rows.append(dict(k=k_starts, s=t_k, agg_it_s=agg,
                         agg_evals_s=agg * n_mc))
        print('K={:2d} starts: {:7.3f}s = {:8.0f} aggregate it/s '
              '({:.3g} evals/s, {:.2f}x single)'.format(
                  k_starts, t_k, agg, agg * n_mc,
                  agg / (n_iters / t_full)), flush=True)
    results['multistart_batching'] = rows

    with open(args.json, 'w') as f:
        json.dump(results, f, indent=1)
    print('wrote', args.json)


if __name__ == '__main__':
    main()
