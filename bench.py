"""Benchmark: ELBO-gradient evaluations per second per chip.

Primary workload (BASELINE.md): eight-schools centered KLVI with a
mean-field Student-t(40) family and n_mc = 100, the reference's headline
configuration (reference: notebooks/eight-schools.ipynb cell 16 —
278.19 it/s on the author's laptop, i.e. ~27.8k ELBO-gradient evals/s).
The whole optimization loop is one compiled `lax.scan`; compile time is
excluded by timing a second invocation of the same program.

Prints exactly one JSON line on stdout; diagnostics go to stderr.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')

from viabel_tpu import (adagrad_optimize, black_box_klvi,
                        mean_field_t_variational_family)
from viabel_tpu.models import eight_schools_cp_model

BASELINE_IT_PER_S = 278.19     # reference laptop, eight-schools CP KLVI
N_MC = 100
N_ITERS = 5000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    log('devices: {}'.format(jax.devices()))
    model = eight_schools_cp_model()
    fam = mean_field_t_variational_family(model.dim, 40)
    # presampled mode: all Student-t draw generation batched outside the
    # scan (bit-identical trajectories, ~1.8x faster; see objectives.py)
    obj = black_box_klvi(fam, model.log_prob, N_MC, presampled=True)
    init = jnp.asarray(
        np.concatenate([np.zeros(model.dim), np.zeros(model.dim)]),
        dtype=jnp.float32)

    t0 = time.perf_counter()
    out = adagrad_optimize(N_ITERS, obj, init, key=jax.random.PRNGKey(0),
                           learning_rate=.01, learning_rate_end=.001)
    jax.block_until_ready(out[0])
    t_first = time.perf_counter() - t0
    log('first run (incl. compile): {:.2f}s'.format(t_first))

    # steady state: same program shape, fresh key -> compile cache hit
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        out = adagrad_optimize(N_ITERS, obj, init,
                               key=jax.random.PRNGKey(rep + 1),
                               learning_rate=.01, learning_rate_end=.001)
        jax.block_until_ready(out[0])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    it_per_s = N_ITERS / dt
    evals_per_s = it_per_s * N_MC
    log('steady-state: {:.3f}s for {} iters = {:.0f} it/s '
        '({:.0f} ELBO-grad evals/s); reference laptop {:.2f} it/s'.format(
            dt, N_ITERS, it_per_s, evals_per_s, BASELINE_IT_PER_S))
    mean, cov = fam.mean_and_cov(out[0])
    log('posterior mean head: {}'.format(np.asarray(mean)[:3]))

    print(json.dumps({
        'metric': 'eight_schools_cp_klvi_elbo_grad_evals_per_s_per_chip',
        'value': round(evals_per_s, 1),
        'unit': 'evals/s/chip',
        'vs_baseline': round(it_per_s / BASELINE_IT_PER_S, 2),
    }))


if __name__ == '__main__':
    main()
