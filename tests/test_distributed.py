"""Real multi-process distributed execution of the shipped estimators.

The reference has no distributed anything (SURVEY.md section 2.4); the
scaling claim of `viabel_tpu.parallel` is that the same shard_map programs
run unchanged when the mesh spans hosts.  This test actually does it: two
OS processes x 2 CPU devices each form a 4-device global mesh via
`jax.distributed.initialize` (collectives cross the process boundary over
Gloo), run `sharded_all_bounds` + `psislw_sharded`, and must reproduce the
single-process 4-device numbers exactly (per-device keys depend only on
the mesh axis index, not on process layout).
"""
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return str(s.getsockname()[1])


@pytest.mark.slow
def test_two_process_sharded_bounds_match_single_process():
    worker = os.path.join(os.path.dirname(__file__),
                          'distributed_worker.py')
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), '2', port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(json.loads(out.decode().strip().splitlines()[-1]))

    # both ranks must agree (the results are replicated collectives)
    for key in ('d2', 'W2', 'mean_error', 'khat'):
        assert outs[0][key] == outs[1][key], key
    assert outs[0]['n_global'] == 4 and outs[0]['n_local'] == 2

    # single-process reference on a 4-device mesh (same axis indices ->
    # same per-device keys -> identical draws and statistics)
    import jax.numpy as jnp
    from viabel_tpu import mean_field_gaussian_variational_family
    from viabel_tpu.models import funnel_model
    from viabel_tpu.parallel import (make_mesh, psislw_sharded,
                                     sharded_all_bounds)
    from viabel_tpu.parallel import sharded_psis_moments
    model = funnel_model()
    fam = mean_field_gaussian_variational_family(2)
    vp = jnp.asarray([0.0, 0.0, 0.3, -0.2])
    mesh = make_mesh(axis_names=('sample',), devices=jax.devices()[:4])
    ref, lw, samples = sharded_all_bounds(
        model.log_prob, fam, vp, 40000, jax.random.PRNGKey(0), mesh,
        moment_bound_fn=lambda p: float(fam.pth_moment(vp, p)),
        q_var=np.asarray(fam.mean_and_cov(vp)[1]),
        return_log_weights=True, return_samples=True)
    slw, khat_ref = psislw_sharded(lw, mesh)
    psis_mean_ref, psis_cov_ref = sharded_psis_moments(samples, slw, mesh)
    np.testing.assert_allclose(outs[0]['d2'], ref['d2'], rtol=1e-12)
    np.testing.assert_allclose(outs[0]['W2'], ref['W2'], rtol=1e-12)
    np.testing.assert_allclose(outs[0]['mean_error'], ref['mean_error'],
                               rtol=1e-12)
    np.testing.assert_allclose(outs[0]['khat'], float(khat_ref), rtol=1e-12)
    np.testing.assert_allclose(outs[0]['psis_mean'],
                               np.asarray(psis_mean_ref), rtol=1e-12)
    np.testing.assert_allclose(outs[0]['psis_cov_tr'],
                               float(jnp.trace(psis_cov_ref)),
                               rtol=1e-12)
