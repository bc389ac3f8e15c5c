"""Regenerate every ground-truth posterior moment stored in the repo.

The reference anchors its benchmarks on external Stan NUTS runs recorded
only as notebook cell outputs (reference: notebooks/eight-schools.ipynb
cells 10-16, robust-regression.ipynb cell 9).  This script reproduces all of
those anchors with the in-repo adaptive HMC sampler (`viabel_tpu.mcmc`) so
the ground truth is independently checkable:

* eight-schools CP/NCP moments -> rewrites
  ``viabel_tpu/models/_ground_truth.npz`` (the constants the models load);
* robust-regression moments -> printed next to the notebook's NUTS values
  (the stored constants keep the notebook values, which define BASELINE.md;
  this script verifies the agreement).

Runs on CPU in ~30 s.  Usage: ``python benchmarks/ground_truth.py``.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np  # noqa: E402

from viabel_tpu.mcmc import hmc_ground_truth  # noqa: E402
from viabel_tpu.models import (eight_schools_ncp_model,  # noqa: E402
                               eight_schools_ncp_to_cp,
                               robust_regression_model)


def main():
    np.set_printoptions(precision=4, suppress=True, linewidth=100)

    print('== eight-schools (NCP sampled, 8 chains x 50k) ==')
    m = eight_schools_ncp_model()
    # one R-hat-gated HMC run; CP moments from the transformed draws
    # (reference: eight-schools.ipynb cell 14), NCP moments from the same
    # run's raw-draw diagnostics
    cp = hmc_ground_truth(m, key=jax.random.PRNGKey(2), n_samples=50000,
                          n_warmup=2000, n_chains=8,
                          transform=eight_schools_ncp_to_cp)
    ncp = dict(mean=cp['diagnostics']['mean'],
               cov=cp['diagnostics']['cov'])
    print('CP  mean:', cp['mean'])
    print('CP  std :', np.sqrt(np.diag(cp['cov'])))
    print('NCP mean:', ncp['mean'])
    print('max split R-hat: {:.4f}'.format(
        cp['diagnostics']['r_hat'].max()))

    out = os.path.join(os.path.dirname(__file__), '..', 'viabel_tpu',
                       'models', '_ground_truth.npz')
    np.savez_compressed(out,
                        eight_schools_cp_mean=cp['mean'],
                        eight_schools_cp_cov=cp['cov'],
                        eight_schools_ncp_mean=ncp['mean'],
                        eight_schools_ncp_cov=ncp['cov'])
    print('wrote', os.path.normpath(out))

    print()
    print('== robust regression (8 chains x 20k) ==')
    m2 = robust_regression_model()
    gt = hmc_ground_truth(m2, key=jax.random.PRNGKey(1), n_samples=20000,
                          n_warmup=1000, n_chains=8)
    print('in-repo HMC mean:', gt['mean'])
    print('notebook NUTS   :', m2.true_mean)
    print('in-repo HMC cov :', gt['cov'].ravel())
    print('notebook NUTS   :', m2.true_cov.ravel())
    err = np.abs(gt['mean'] - m2.true_mean).max()
    print('max |mean diff| = {:.4f} (MC noise ~ 0.005)'.format(err))
    assert err < 0.02, 'robust-regression HMC disagrees with notebook NUTS'


if __name__ == '__main__':
    main()
