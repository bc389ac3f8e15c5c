"""Attribute the sharded bound+PSIS pass's single-chip overhead (VERDICT r4).

BENCH_r04 recorded the 1-device-mesh sharded bound+PSIS pass at 0.313 s
against 0.131 s for the unsharded equivalent (0.102 s bound pass + 0.029 s
PSIS) — a ~2.4x constant that matters because the sharded program is the
one a real pod runs.  This study decomposes it on the real chip:

* stage timings: `sharded_all_bounds` alone, `psislw_sharded` alone, and
  their sum vs the unsharded draw+score / `all_bounds` / `psislw` stages;
* device-vs-dispatch split per stage from profiler traces — is the gap
  device work (a worse program) or host work (more dispatches + the
  tunnel's per-dispatch floor)?
* the n-scaling of the gap (fixed overhead vs proportional), at
  n in {2.5e5, 2.5e6};
* the fix candidate: ONE fused sharded program (draw -> score -> stats ->
  PSIS in a single dispatch, `parallel.sharded_bound_psis`) — the layout
  serve `/bounds` actually wants — timed against the two-program path.

Writes benchmarks/sharded_overhead.json; SCALING.md tier 4 carries the
conclusions.

Usage: python benchmarks/sharded_overhead.py [--cpu] [--n 2500000]
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


def _traced(fn):
    """Pure device seconds for one call, from a profiler trace (None if
    tracing fails)."""
    try:
        import tempfile

        from viabel_tpu.utils import profile_trace, trace_device_time
        trace_dir = tempfile.mkdtemp(prefix='viabel_shard_ovh_')
        with profile_trace(trace_dir):
            jax.block_until_ready(fn(9))
        return trace_device_time(trace_dir)
    except Exception as e:
        print('  trace unavailable: {}'.format(e), flush=True)
        return None


def run_n(n, model, fam, opt_param, moment_bound_fn, q_var):
    from viabel_tpu.bounds import all_bounds
    from viabel_tpu.experiments import get_samples_and_log_weights
    from viabel_tpu.parallel import (make_mesh, psislw_sharded,
                                     sharded_all_bounds)
    from viabel_tpu.psis import psislw

    mesh1 = make_mesh(axis_names=('sample',), shape=(1,),
                      devices=[jax.devices()[0]])
    row = dict(n=n)
    print('--- n = {:.1e} ---'.format(float(n)), flush=True)

    # unsharded stages
    def draw(r):
        return get_samples_and_log_weights(
            model.log_prob, fam, opt_param, n,
            jax.random.PRNGKey(1000 + r))[1]
    row['unsharded_draw_s'] = _steady(draw)
    row['unsharded_draw_device_s'] = _traced(draw)
    lw = draw(0)
    lw2 = draw(1)
    jax.block_until_ready((lw, lw2))
    all_bounds(lw, q_var=q_var, moment_bound_fn=moment_bound_fn)  # compile
    t0 = time.perf_counter()
    all_bounds(lw2, q_var=q_var, moment_bound_fn=moment_bound_fn)
    row['unsharded_bounds_s'] = time.perf_counter() - t0

    def psis_unsh(r):
        return psislw(draw(0) if r == 0 else (lw if r % 2 else lw2))[0]
    row['unsharded_psis_s'] = _steady(psis_unsh)
    row['unsharded_psis_device_s'] = _traced(lambda r: psislw(lw)[0])

    # sharded stage 1: draw+score+stats+bounds (one program + host algebra)
    def sh_bounds(r):
        res, lw_s = sharded_all_bounds(
            model.log_prob, fam, opt_param, n,
            jax.random.PRNGKey(2000 + r), mesh1,
            moment_bound_fn=moment_bound_fn, q_var=q_var,
            return_log_weights=True)
        return lw_s
    row['sharded_bounds_s'] = _steady(sh_bounds)
    row['sharded_bounds_device_s'] = _traced(sh_bounds)

    # sharded stage 2: PSIS on the sharded log-weights
    lw_s = sh_bounds(0)
    lw_s2 = sh_bounds(1)
    jax.block_until_ready((lw_s, lw_s2))

    def sh_psis(r):
        return psislw_sharded(lw_s if r % 2 else lw_s2, mesh1)[0]
    row['sharded_psis_s'] = _steady(sh_psis)
    row['sharded_psis_device_s'] = _traced(sh_psis)

    # two-program sharded total (the BENCH_r04 'sharded_bound_psis_s' shape)
    def sh_two(r):
        lw_r = sh_bounds(r)
        return psislw_sharded(lw_r, mesh1)[0]
    row['sharded_two_prog_s'] = _steady(sh_two)

    # fix candidate: the fused single-program sharded pass
    try:
        from viabel_tpu.parallel import sharded_bound_psis

        def sh_fused(r):
            res, slw, khat = sharded_bound_psis(
                model.log_prob, fam, opt_param, n,
                jax.random.PRNGKey(3000 + r), mesh1,
                moment_bound_fn=moment_bound_fn, q_var=q_var)
            return slw
        row['sharded_fused_s'] = _steady(sh_fused)
        row['sharded_fused_device_s'] = _traced(sh_fused)
    except ImportError:
        print('  (sharded_bound_psis not available yet)', flush=True)

    for k in sorted(row):
        if k != 'n' and row[k] is not None:
            print('  {:28s} {:8.4f} s'.format(k, row[k]), flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n', type=int, default=2500000)
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--json', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'sharded_overhead.json'))
    args = p.parse_args()
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from viabel_tpu import (adagrad_optimize, black_box_klvi,
                            mean_field_t_variational_family)
    from viabel_tpu.bounds import family_moment_bounds
    from viabel_tpu.models import eight_schools_cp_model

    model = eight_schools_cp_model()
    fam = mean_field_t_variational_family(model.dim, 40)
    obj = black_box_klvi(fam, model.log_prob, 100, presampled=True)
    opt_param = adagrad_optimize(
        5000, obj, jnp.zeros(fam.var_param_dim, jnp.float32),
        key=jax.random.PRNGKey(0), learning_rate=.01,
        learning_rate_end=.001)[0]
    jax.block_until_ready(opt_param)
    moment_bound_fn = family_moment_bounds(fam, opt_param)
    q_var = np.asarray(fam.mean_and_cov(opt_param)[1])

    print('device: {}'.format(jax.devices()[0]), flush=True)
    rows = [run_n(n, model, fam, opt_param, moment_bound_fn, q_var)
            for n in (args.n // 10, args.n)]
    with open(args.json, 'w') as f:
        json.dump(dict(device=str(jax.devices()[0]), rows=rows), f, indent=1)
    print('wrote', args.json)


if __name__ == '__main__':
    main()
