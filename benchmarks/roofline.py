"""Roofline/utilization study for the headline pipeline (VERDICT r4 item 2).

BENCH reports speedups over the reference laptop; this study states what
fraction of the CHIP's capability each phase of the d = 10 headline
workload achieves, so "is another 2-10x available, or is this the machine
limit?" is answerable from recorded numbers.

Two parts:

1. **Speed-of-light microbenches** — the chip's achievable rates for the
   three resources this workload can be bound by, measured with the same
   amortized-scan discipline as everything else here (K reps inside one
   compiled program, varied per rep, outputs consumed; CLAUDE.md):
   * raw RNG variates/s (threefry uniforms, and normals);
   * HBM stream bandwidth (bytes/s of a large f32 reduction);
   * MXU f32 matmul FLOP/s at d=4096 (the workload is pinned to
     Precision.HIGHEST f32, so the f32 rate is the relevant ceiling;
     bf16 is also recorded for context).

2. **Phase accounting** — each phase of the eight-schools headline
   pipeline (KLVI optimizer step, t-draw generation, scoring, the fused
   stats pass, PSIS) is timed as pure DEVICE time via a profiler trace
   (`utils.trace_device_time`; wall clock here is dispatch-floor-
   dominated), its resource demand is counted from the program (variates
   drawn, bytes streamed), and achieved-vs-light-speed is reported.

The conclusions go in THROUGHPUT.md's "Roofline" section.  Workload:
eight-schools CP (d = 10), mean-field t(40), n_mc = 100, 5000 iters,
2.5e6-sample bound pass (bench.py's configuration; reference:
notebooks/eight-schools.ipynb cell 16).

Usage: python benchmarks/roofline.py [--cpu] [--n-bound 2500000]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 8  # amortization reps inside each compiled program


def _device_time(fn, *args):
    """Pure on-device seconds for one call of compiled `fn` (profiler
    trace; excludes host dispatch and the tunnel's latency floor).  Falls
    back to wall clock where the trace carries no device track (the CPU
    smoke path)."""
    from viabel_tpu.utils import profile_trace, trace_device_time
    jax.block_until_ready(fn(*args))  # compile outside the trace
    d = tempfile.mkdtemp(prefix='roofline_')
    with profile_trace(d):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        wall = time.perf_counter() - t0
    dev = trace_device_time(d)
    return dev if dev else wall


def _amortized(body, n_reps=REPS):
    """Device seconds per rep of `body(key)` amortized over an n-rep scan
    (per-rep fold_in keys; summed output consumed)."""

    @jax.jit
    def prog(key):
        def step(acc, i):
            return acc + body(jax.random.fold_in(key, i)), None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                              jnp.arange(n_reps))
        return out

    return _device_time(prog, jax.random.PRNGKey(7)) / n_reps


def speed_of_light(small=False):
    """Measure the chip's achievable RNG / HBM / MXU rates."""
    sol = {}
    n = 64 * 1024 * 1024  # 64M f32 elements = 256 MB (beats VMEM caching)
    if small:  # CPU smoke-test sizes only
        n = 2 * 1024 * 1024

    # raw threefry uniforms and normals, per second
    t = _amortized(lambda k: jnp.sum(
        jax.random.uniform(k, (n,), jnp.float32)))
    sol['uniforms_per_s'] = n / t
    t = _amortized(lambda k: jnp.sum(
        jax.random.normal(k, (n,), jnp.float32)))
    sol['normals_per_s'] = n / t

    # HBM stream: sum of a resident 256 MB array; the per-rep key only
    # perturbs a scalar so each rep re-reads the array from HBM.  The
    # array is a jit ARGUMENT, not a closure capture — a captured array
    # becomes an HLO constant and the remote compile service rejects the
    # 256 MB request body (HTTP 413)
    x = jax.random.normal(jax.random.PRNGKey(3), (n,), jnp.float32)
    x = jax.block_until_ready(x)

    @jax.jit
    def stream(x, key):
        def step(acc, i):
            c = jax.random.uniform(jax.random.fold_in(key, i), ())
            return acc + jnp.sum(x * c), None
        out, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(REPS))
        return out

    t = _device_time(stream, x, jax.random.PRNGKey(11)) / REPS
    sol['hbm_bytes_per_s'] = 4 * n / t

    # MXU: 4096^3 matmul, f32-HIGHEST (the workload's pinned precision)
    # and bf16 (the chip's nominal peak) for context
    m = 512 if small else 4096
    a = jax.random.normal(jax.random.PRNGKey(5), (m, m), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(6), (m, m), jnp.float32)
    a, b = jax.block_until_ready((a, b))
    flops = 2.0 * m * m * m

    def mm(precision, dtype):
        @jax.jit
        def prog(a, b, key):
            def step(acc, i):
                c = jax.random.uniform(jax.random.fold_in(key, i), (),
                                       dtype=dtype)
                y = jnp.dot(a.astype(dtype) * c, b.astype(dtype),
                            precision=precision)
                return acc + jnp.sum(y.astype(jnp.float32)), None
            out, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(REPS))
            return out
        return _device_time(prog, a, b, jax.random.PRNGKey(13)) / REPS

    sol['mxu_f32_highest_flops_per_s'] = flops / mm(
        jax.lax.Precision.HIGHEST, jnp.float32)
    sol['mxu_bf16_flops_per_s'] = flops / mm(
        jax.lax.Precision.DEFAULT, jnp.bfloat16)
    return sol


def phases(n_bound):
    """Device time + resource demand per headline-pipeline phase."""
    from viabel_tpu import (adagrad_optimize, black_box_klvi,
                            mean_field_t_variational_family)
    from viabel_tpu.bounds import log_weight_stats
    from viabel_tpu.models import eight_schools_cp_model
    from viabel_tpu.psis import psislw

    model = eight_schools_cp_model()
    d, df, n_mc, n_iters = model.dim, 40, 100, 5000
    fam = mean_field_t_variational_family(d, df)
    init = jnp.zeros(fam.var_param_dim, dtype=jnp.float32)
    klvi = black_box_klvi(fam, model.log_prob, n_mc, presampled=True)

    # per-element cost of one t(40) draw in raw variates
    # (student_t_sample: 1 normal + Gamma(20,1) = 20 uniforms, grouped
    # logs; distributions.py:40-110)
    variates_per_t = 1 + df // 2
    rows = []

    # -- phase: optimizer (5000 sequential steps) --
    def opt(r):
        return adagrad_optimize(n_iters, klvi, init,
                                key=jax.random.PRNGKey(300 + r),
                                learning_rate=.01,
                                learning_rate_end=.001)[0]
    t_opt = _device_time(opt, 1)
    # per-iteration demand: n_mc*d t-variates presampled (hoisted out of
    # the scan) + O(n_mc*d) elementwise transform/score/VJP + O(window*P)
    # update — a few hundred KB of HBM traffic per step
    step_bytes = 4 * (3 * n_mc * d + 3 * 10 * fam.var_param_dim)
    rows.append(dict(
        phase='optimizer (5000 it)', device_s=t_opt,
        resource='sequential step latency',
        demand='{} dependent steps; ~{:.0f} KB HBM/step'.format(
            n_iters, step_bytes / 1e3),
        light_speed_s=None, note='bound by the serial scan dependency, '
        'not RNG/HBM/MXU: per-step device time {:.2f} us vs ~{:.2f} us '
        'of HBM traffic'.format(1e6 * t_opt / n_iters,
                                1e6 * step_bytes / 8.2e11)))

    # -- phase: t-draw generation (2.5e6 x 10) --
    @jax.jit
    def draw(key):
        return fam.base_sample(key, n_bound)
    t_draw = _device_time(draw, jax.random.PRNGKey(401))
    n_norm = n_bound * d            # the z draw
    n_unif = n_bound * d * (df // 2)  # Gamma(20,1) = 20 grouped uniforms
    rows.append(dict(phase='t-draws ({:.1e} x {})'.format(n_bound, d),
                     device_s=t_draw, resource='RNG variates',
                     demand='{:.2e} raw variates'.format(n_norm + n_unif),
                     n_normals=n_norm, n_uniforms=n_unif,
                     write_bytes=4 * n_bound * d))

    draws = jax.block_until_ready(draw(jax.random.PRNGKey(402)))

    # -- phase: scoring (model + q log density on presampled draws) --
    @jax.jit
    def score(t_draws, param):
        x = fam.transform(param, t_draws)
        return model.log_prob(x) - fam.log_prob(param, x)
    t_score = _device_time(score, draws, init)
    # reads the (n, d) draws once; the two densities fuse over the same
    # stream; writes (n,) log-weights
    score_bytes = 4 * n_bound * d + 4 * n_bound
    rows.append(dict(phase='score (logp - logq)', device_s=t_score,
                     resource='HBM stream', read_bytes=score_bytes,
                     demand='{:.0f} MB HBM'.format(score_bytes / 1e6)))

    lw = jax.block_until_ready(score(draws, init))

    # -- phase: fused bound statistics --
    @jax.jit
    def stats(lw):
        s = log_weight_stats(lw)
        return sum(jnp.sum(v) for v in s.values())
    t_stats = _device_time(stats, lw)
    stats_bytes = 4 * n_bound  # one read of the log-weights
    rows.append(dict(phase='bound stats (fused)', device_s=t_stats,
                     resource='HBM stream', read_bytes=stats_bytes,
                     demand='{:.0f} MB HBM'.format(stats_bytes / 1e6)))

    # -- phase: PSIS --
    @jax.jit
    def psis(lw):
        slw, khat = psislw(lw)
        return jnp.sum(slw) + khat
    t_psis = _device_time(psis, lw)
    # top_k pass + tail smoothing scatter + exp/renorm rewrite:
    # ~3 passes over the (n,) weights
    psis_bytes = 3 * 4 * n_bound
    rows.append(dict(phase='PSIS (psislw)', device_s=t_psis,
                     resource='HBM stream + top_k', read_bytes=psis_bytes,
                     demand='~{:.0f} MB HBM'.format(psis_bytes / 1e6)))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--n-bound', type=int, default=2500000)
    p.add_argument('--small', action='store_true',
                   help='tiny sizes: smoke-test the harness, not the chip')
    p.add_argument('--json', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'roofline.json'))
    args = p.parse_args()
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    print('device: {}'.format(jax.devices()[0]), flush=True)

    sol = speed_of_light(small=args.small)
    for k, v in sol.items():
        print('light speed {}: {:.3e}'.format(k, v), flush=True)

    rows = phases(args.n_bound)
    print()
    for r in rows:
        # achieved fraction of the binding limit
        if 'n_normals' in r:
            rng_s = (r['n_normals'] / sol['normals_per_s']
                     + r['n_uniforms'] / sol['uniforms_per_s'])
            limit_s = max(rng_s, r['write_bytes'] / sol['hbm_bytes_per_s'])
        elif 'read_bytes' in r:
            limit_s = r['read_bytes'] / sol['hbm_bytes_per_s']
        else:
            limit_s = None
        if limit_s is not None:
            r['light_speed_s'] = limit_s
            r['pct_of_light'] = 100.0 * limit_s / r['device_s']
        pct = r.get('pct_of_light')
        print('{:26s} {:9.4f}s device | {:24s} | {} | {}'.format(
            r['phase'], r['device_s'], r['resource'], r['demand'],
            'at {:.0f}% of light speed ({:.4f}s)'.format(pct, r['light_speed_s'])
            if pct is not None else r.get('note', '')), flush=True)

    with open(args.json, 'w') as f:
        json.dump(dict(device=str(jax.devices()[0]),
                       n_bound=args.n_bound, speed_of_light=sol,
                       phases=rows), f, indent=1)
    print('wrote', args.json)


if __name__ == '__main__':
    main()
