"""Measure the two Mahalanobis implementations behind the full-rank
log-densities on the attached chip.

The shipped `distributions._chol_mahalanobis_and_logdet` computes
``z = L^{-1} dev^T`` as an explicit (d, d) triangular inverse followed by a
precision-pinned (d, n) matmul; the obvious alternative is XLA's
TriangularSolve over the n sample columns.  Two claims to verify on real
hardware (ARCHITECTURE.md "Precision policy"):

1. the solve serializes over the sample axis on TPU while the matmul rides
   the MXU (throughput claim);
2. both agree numerically on well-conditioned factors (the accuracy cost of
   the explicit inverse is nil at d <= ~30; correctness claim).

Timing uses the repo's dispatch-floor-amortized discipline: K invocations
inside one compiled lax.scan, slope (T_K - T_1)/(K - 1), inputs varied per
step and outputs consumed (CLAUDE.md; benchmarks/pallas_study.py).

Usage: python benchmarks/mahalanobis_study.py [--n 1000000] [--d 10] [--k 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _maha_inverse(chol, dev_t):
    eye = jnp.eye(chol.shape[-1], dtype=chol.dtype)
    inv_chol = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
    z = jnp.matmul(inv_chol, dev_t, precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(z * z, axis=0)


def _maha_solve(chol, dev_t):
    z = jax.scipy.linalg.solve_triangular(chol, dev_t, lower=True)
    return jnp.sum(z * z, axis=0)


def _slope_timer(fn, chol, dev_t, k):
    """Amortized per-invocation seconds via lax.scan of length k."""

    def make(steps):
        def body(carry, i):
            # vary the input per step (defeats CSE/result caching) and
            # consume the output (defeats DCE)
            out = fn(chol, dev_t + i.astype(dev_t.dtype) * 1e-6)
            return carry + jnp.sum(out), i
        @jax.jit
        def run():
            tot, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(steps))
            return tot
        return run

    run1, runk = make(1), make(k)
    jax.block_until_ready(run1()); jax.block_until_ready(runk())  # compile
    def best(r, reps=3):
        b = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(r())
            b = min(b, time.perf_counter() - t0)
        return b
    return (best(runk) - best(run1)) / (k - 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n', type=int, default=1000000)
    p.add_argument('--d', type=int, default=10)
    p.add_argument('--k', type=int, default=32)
    args = p.parse_args()

    print('device: {}; n = {:.2g}, d = {}'.format(
        jax.devices()[0], float(args.n), args.d))
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    L = np.tril(rng.randn(args.d, args.d) * 0.2) + np.diag(
        np.exp(rng.randn(args.d) * 0.3))
    chol = jnp.asarray(L, dtype=jnp.float32)
    dev_t = jax.random.normal(key, (args.d, args.n), dtype=jnp.float32)

    # correctness: both paths vs f64 dense oracle
    got_inv = np.asarray(_maha_inverse(chol, dev_t[:, :4096]))
    got_sol = np.asarray(_maha_solve(chol, dev_t[:, :4096]))
    oracle = np.einsum(
        'in,ij,jn->n', np.asarray(dev_t[:, :4096], dtype=np.float64),
        np.linalg.inv(L @ L.T), np.asarray(dev_t[:, :4096],
                                           dtype=np.float64))
    err_inv = float(np.max(np.abs(got_inv - oracle) / np.abs(oracle)))
    err_sol = float(np.max(np.abs(got_sol - oracle) / np.abs(oracle)))
    print('max rel err vs f64 oracle: inverse+matmul {:.2e} | solve {:.2e}'
          .format(err_inv, err_sol))

    t_inv = _slope_timer(_maha_inverse, chol, dev_t, args.k)
    t_sol = _slope_timer(_maha_solve, chol, dev_t, args.k)
    print('amortized per-pass: inverse+matmul {:.3f} ms | TriangularSolve '
          '{:.3f} ms | speedup {:.1f}x'.format(
              t_inv * 1e3, t_sol * 1e3, t_sol / t_inv))


if __name__ == '__main__':
    main()
