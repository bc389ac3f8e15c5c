"""Mesh-scaling benchmark: samples/s for sharded bound estimation and
chain-parallel optimization as the device count grows.

The BASELINE.json north star asks for >= 80% linear samples/s scaling from
1 host to N hosts.  Real multi-chip hardware is not attached in this
development environment, so by default this runs on a virtual CPU device
pool (``--devices 8`` forces ``xla_force_host_platform_device_count``);
the code path exercised — `shard_map` over a `Mesh` with psum/pmax/top_k
collectives — is exactly what executes on a TPU pod slice, where each mesh
axis member is a physical chip and the collectives ride the ICI.

Note: virtual CPU devices share the host's physical cores, so measured
"scaling" here validates the mechanism (work division + collectives), not
wall-clock speedup; run on a real slice for hardware numbers.

Usage: python benchmarks/scaling.py [--devices 8] [--n 2000000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--devices', type=int, default=8)
    p.add_argument('--n', type=int, default=2000000)
    args = p.parse_args()

    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count={}'
                               .format(args.devices))
    import jax
    if args.devices > 1:
        # multi-device runs use the virtual CPU pool in this environment
        # (must be selected before any backend is initialized)
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    from viabel_tpu import mean_field_t_variational_family
    from viabel_tpu.models import eight_schools_cp_model
    from viabel_tpu.parallel import make_mesh, sharded_all_bounds

    model = eight_schools_cp_model()
    fam = mean_field_t_variational_family(model.dim, 40)
    var_param = jnp.zeros(fam.var_param_dim, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    n = args.n

    print('devices: {} x {}'.format(len(jax.devices()),
                                    jax.devices()[0].platform))
    results = {}
    sizes = [d for d in [1, 2, 4, 8, 16] if d <= len(jax.devices())]
    for n_dev in sizes:
        mesh = make_mesh(axis_names=('sample',), shape=(n_dev,),
                         devices=jax.devices()[:n_dev])
        # warm-up / compile
        sharded_all_bounds(model.log_prob, fam, var_param, n, key, mesh)
        best = float('inf')
        for rep in range(3):
            t0 = time.perf_counter()
            res = sharded_all_bounds(model.log_prob, fam, var_param, n,
                                     jax.random.fold_in(key, rep), mesh)
            best = min(best, time.perf_counter() - t0)
        rate = n / best
        results[n_dev] = rate
        eff = rate / (results[1] * n_dev) if 1 in results else 1.0
        print('{:2d} device(s): {:>12.3g} samples/s   '
              'efficiency vs linear: {:5.1f}%'.format(n_dev, rate,
                                                      100 * eff))
    return results


if __name__ == '__main__':
    main()
