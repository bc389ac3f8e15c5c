"""Kernel-level performance study of the bound-estimation hot path.

Measures the true per-pass device cost of every stage of the Monte Carlo
bound pipeline (draws -> transform -> model score -> family score ->
reduction) on real TPU hardware, with a methodology that survives this
environment's hostile timing conditions (see CLAUDE.md):

* the remote-dispatch latency floor varies by session from ~0.1 ms to
  ~35 ms, so a single device call measures the floor, not the work —
  every stage is timed as the SLOPE between a K=1 and a K=9 repetition
  of the stage inside one compiled `lax.scan` program;
* results are consumed by fetching the scalar output to the host
  (``float(out)``), which provably includes execution (async acks,
  XLA dead-code elimination, and server-side result caching all
  otherwise corrupt timings);
* inputs vary per repetition (`fold_in`) so nothing is constant-folded;
* a known-FLOPs matmul chain calibrates the methodology each run — if the
  reported TFLOP/s is not within sane range of the chip's peak, discard
  the session's numbers.

This harness is what produced the measurements behind
benchmarks/PALLAS_DECISION.md (the retirement of the repo's Pallas
kernels and the replacement of `jax.random.t` with the rejection-free
`distributions.student_t_sample`).

Usage: ``python benchmarks/pallas_study.py [n_samples]`` (on TPU).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from viabel_tpu import mean_field_t_variational_family
from viabel_tpu.bounds import log_weight_stats
from viabel_tpu.distributions import student_t_sample
from viabel_tpu.models import eight_schools_cp_model

DIM = 10


def _timed(fn, *args, reps=3):
    float(fn(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def slope(name, fn, *args, k_lo=1, k_hi=9):
    """Per-pass seconds via the K-repetition slope (dispatch-floor-proof)."""
    t_lo = _timed(fn, *args, k_lo)
    t_hi = _timed(fn, *args, k_hi)
    per = (t_hi - t_lo) / (k_hi - k_lo)
    print('{:<30} T{:<2}={:8.2f} ms  T{:<2}={:8.2f} ms  per-pass={:7.3f} ms'
          .format(name, k_lo, t_lo * 1e3, k_hi, t_hi * 1e3, per * 1e3),
          flush=True)
    return per


def main(n=1000000):
    print('devices:', jax.devices(), flush=True)

    # calibration: f32 4096^3 matmuls, 137.4 GFLOP each
    A = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096),
                          dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnames=('K',))
    def mm_K(A, K):
        def body(c, i):
            c = jnp.dot(c, A, preferred_element_type=jnp.float32)
            return c / jnp.max(jnp.abs(c)), None
        out, _ = lax.scan(body, A, jnp.arange(K))
        return jnp.sum(out[0])

    per = slope('calib matmul 4096^3 f32', lambda a, k: mm_K(a, k), A)
    tflops = 137.4e9 / per / 1e12
    print('   => {:.1f} TFLOP/s f32 achieved (sanity: should be a large '
          'fraction of chip peak)'.format(tflops), flush=True)

    model = eight_schools_cp_model()
    fam = mean_field_t_variational_family(DIM, 40)
    vp = jnp.asarray(np.concatenate([np.ones(DIM) * 2, np.zeros(DIM)]),
                     jnp.float32)

    @functools.partial(jax.jit, static_argnames=('K', 'which'))
    def draw_K(key, K, which):
        def body(c, i):
            k = jax.random.fold_in(key, i)
            zz = (student_t_sample(k, 40, (n, DIM), jnp.float32)
                  if which == 'new'
                  else jax.random.t(k, 40.0, (n, DIM), dtype=jnp.float32))
            return c + jnp.sum(zz * zz), None
        return lax.scan(body, jnp.float32(0), jnp.arange(K))[0]

    slope('jax.random.t draws', lambda k, K: draw_K(k, K, 'old'),
          jax.random.PRNGKey(1))
    slope('student_t_sample draws', lambda k, K: draw_K(k, K, 'new'),
          jax.random.PRNGKey(1))

    z = jax.random.normal(jax.random.PRNGKey(2), (n, DIM),
                          dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnames=('K',))
    def score_K(vp, z, K):
        def body(c, i):
            x = fam.transform(vp + 1e-6 * i, z)
            lw = model.log_prob(x) - fam.log_prob(vp, x)
            s = log_weight_stats(lw)
            return c + s['mean_lw'] + s['mean_rescaled_alpha'], None
        return lax.scan(body, jnp.float32(0),
                        jnp.arange(K, dtype=jnp.float32))[0]

    slope('XLA transform+score+stats', lambda v, zz, K: score_K(v, zz, K),
          vp, z)

    @functools.partial(jax.jit, static_argnames=('K',))
    def full_K(vp, key, K):
        def body(c, i):
            x = fam.sample(jax.random.fold_in(key, i), vp + 1e-6 * i, n)
            lw = model.log_prob(x) - fam.log_prob(vp, x)
            return c + log_weight_stats(lw)['mean_lw'], None
        return lax.scan(body, jnp.float32(0),
                        jnp.arange(K, dtype=jnp.float32))[0]

    slope('full bound pass', lambda v, k, K: full_K(v, k, K), vp,
          jax.random.PRNGKey(3))


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1000000)
