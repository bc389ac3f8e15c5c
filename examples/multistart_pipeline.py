"""Multi-start fused-pipeline workload: K complete validated-VI runs
(optimize + bounds + PSIS-corrected moments) batched into one compiled
device program, with best-start selection by the validated 2-divergence
bound.

The reference runs multi-start optimization sequentially in Python
(reference: viabel/vb.py:417-421) and computes bounds in a separate stage
per run; here the whole K-start workflow is one dispatch
(`viabel_tpu.validated_vi_multistart`).
"""
import argparse
import sys

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

from viabel_tpu import (mean_field_t_variational_family,
                        validated_vi_multistart)
from viabel_tpu.experiments import print_bounds
from viabel_tpu.models import robust_regression_model


def main(full=False, n_iters=None, mc_samples=None, n_starts=4):
    model = robust_regression_model()
    fam = mean_field_t_variational_family(model.dim, 40)
    init = jnp.asarray(np.concatenate([np.zeros(model.dim),
                                       np.ones(model.dim)]),
                       dtype=jnp.float32)
    out = validated_vi_multistart(
        model.log_prob, fam, init, n_iters or (5000 if full else 500),
        n_starts=n_starts, perturb_scale=0.25,
        n_bound_samples=mc_samples or (1000000 if full else 20000),
        learning_rate=.01, learning_rate_end=.001,
        key=jax.random.PRNGKey(0))

    best = out['best']
    print('{} starts; best by validated d2: start {}'.format(
        n_starts, best))
    for k in range(n_starts):
        d2 = out['bounds'][k]['d2']
        print('  start {}: d2 = {:<10.4g} khat = {:.3f}{}'.format(
            k, d2, out['khat'][k], '   <-- best' if k == best else ''))
    print()
    print_bounds(out['bounds'][best])
    mean = np.asarray(out['psis_mean'][best])
    print('PSIS-corrected mean (best start):', np.round(mean, 4))
    print('true mean:                       ',
          np.round(np.asarray(model.true_mean), 4))
    return out


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--full', action='store_true')
    p.add_argument('--n-starts', type=int, default=4)
    args = p.parse_args()
    main(args.full, n_starts=args.n_starts)
