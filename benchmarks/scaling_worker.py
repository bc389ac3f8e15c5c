"""Subprocess worker for benchmarks/scaling.py's 2-process mode.

Each OS process owns half the virtual CPU devices; the shipped sharded
estimators (`sharded_all_bounds` + `psislw_sharded`) run over the global
mesh with collectives crossing the process boundary over Gloo — the same
program structure that rides ICI/DCN on a pod slice.  Prints one JSON line
with replicated results and steady-state timings.

Usage: scaling_worker.py <proc_id> <n_procs> <port> <n_samples> <reps>
"""
import json
import os
import sys
import time


def main():
    proc_id, n_procs = int(sys.argv[1]), int(sys.argv[2])
    port, n, reps = sys.argv[3], int(sys.argv[4]), int(sys.argv[5])
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    from viabel_tpu.parallel import (initialize_distributed, make_mesh,
                                     psislw_sharded, sharded_all_bounds)
    info = initialize_distributed('127.0.0.1:' + port, n_procs, proc_id)

    import warnings

    import jax.numpy as jnp
    from viabel_tpu import mean_field_t_variational_family
    from viabel_tpu.bounds import MonteCarloErrorWarning
    from viabel_tpu.models import eight_schools_cp_model
    warnings.simplefilter('ignore', MonteCarloErrorWarning)

    model = eight_schools_cp_model()
    fam = mean_field_t_variational_family(model.dim, 40)
    vp = jnp.zeros(fam.var_param_dim, dtype=jnp.float32)
    mesh = make_mesh(axis_names=('sample',))  # all global devices
    key = jax.random.PRNGKey(0)

    # single-fetch closed-form moments, no sample materialization — the
    # same timed op as scaling.py's tier-1 `_bound_pass_timer`, so the
    # tier-1/tier-2 comparison is like for like (CLAUDE.md single-fetch
    # rule: never float() device scalars one by one)
    from viabel_tpu.bounds import family_moment_bounds

    def one_pass(k):
        res, lw = sharded_all_bounds(
            model.log_prob, fam, vp, n, k, mesh,
            moment_bound_fn=family_moment_bounds(fam, vp),
            return_log_weights=True)
        slw, khat = psislw_sharded(lw, mesh)
        jax.block_until_ready(slw)
        return res, float(khat)

    res, khat = one_pass(key)  # warm-up / compile
    best = float('inf')
    for rep in range(reps):
        t0 = time.perf_counter()
        res, khat = one_pass(jax.random.fold_in(key, rep))
        best = min(best, time.perf_counter() - t0)

    print(json.dumps(dict(
        proc=proc_id, n_global=info['global_devices'],
        n_local=info['local_devices'], n=n, best_s=best,
        samples_per_s=n / best, d2=float(res['d2']), khat=khat)),
        flush=True)


if __name__ == '__main__':
    main()
