"""Subprocess worker for test_distributed.py: run the shipped sharded
estimators under a REAL multi-process `jax.distributed` setup (each OS
process owns 2 CPU devices; collectives cross the process boundary over
Gloo — the same program structure that runs over ICI/DCN on a pod slice).

Prints one JSON line with the results; the parent compares them against
the identical single-process 4-device computation (per-device PRNG keys
depend only on the mesh axis index, so the numbers must match).
"""
import json
import os
import sys


def main():
    proc_id, n_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    from viabel_tpu.parallel import (initialize_distributed, make_mesh,
                                     psislw_sharded, sharded_all_bounds,
                                     sharded_psis_moments)
    info = initialize_distributed('127.0.0.1:' + port, n_procs, proc_id)
    assert info['global_devices'] == 2 * n_procs, info

    import jax.numpy as jnp
    from viabel_tpu import mean_field_gaussian_variational_family
    from viabel_tpu.models import funnel_model

    model = funnel_model()
    fam = mean_field_gaussian_variational_family(2)
    vp = jnp.asarray([0.0, 0.0, 0.3, -0.2])
    mesh = make_mesh(axis_names=('sample',))  # all 4 global devices

    res, lw, samples = sharded_all_bounds(
        model.log_prob, fam, vp, 40000, jax.random.PRNGKey(0), mesh,
        moment_bound_fn=lambda p: float(fam.pth_moment(vp, p)),
        q_var=__import__('numpy').asarray(fam.mean_and_cov(vp)[1]),
        return_log_weights=True, return_samples=True)
    slw, khat = psislw_sharded(lw, mesh)
    psis_mean, psis_cov = sharded_psis_moments(samples, slw, mesh)
    print(json.dumps(dict(
        proc=proc_id, n_global=info['global_devices'],
        n_local=info['local_devices'],
        d2=float(res['d2']), W2=float(res['W2']),
        mean_error=float(res['mean_error']), khat=float(khat),
        psis_mean=[float(v) for v in psis_mean],
        psis_cov_tr=float(jnp.trace(psis_cov)))), flush=True)


if __name__ == '__main__':
    main()
