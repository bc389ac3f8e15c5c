"""Real multi-process distributed execution of the shipped programs.

The reference has no distributed anything (SURVEY.md section 2.4); the
scaling claim of `viabel_tpu.parallel` is that the same shard_map programs
run unchanged when the mesh spans hosts.  These tests actually do it: two
OS processes x 2 CPU devices each form a 4-device global mesh via
`jax.distributed.initialize` (collectives cross the process boundary over
Gloo) and must reproduce the single-process 4-device numbers exactly
(per-device keys depend only on the mesh axis index, not on process
layout).  Coverage spans the sample-sharded estimators, the
precision-sensitive full-rank family, column-stacked PSIS-LOO, and the
flagship 2-D ``(chain, sample)`` fused multistart + the mesh-sharded IA
chains runner (round-3 review items 1 and 7).
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


def _run_two_process(mode):
    """Launch 2 worker processes in `mode`; return both ranks' JSON."""
    worker = os.path.join(os.path.dirname(__file__),
                          'distributed_worker.py')
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), '2', port, mode],
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
    assert outs[0]['n_global'] == 4 and outs[0]['n_local'] == 2
    return outs


def _assert_ranks_agree(outs, keys):
    for key in keys:
        assert outs[0][key] == outs[1][key], key


@pytest.mark.slow
def test_two_process_sharded_bounds_match_single_process():
    outs = _run_two_process('bounds')
    _assert_ranks_agree(outs, ('d2', 'W2', 'mean_error', 'khat',
                               'psis_mean', 'psis_cov_tr'))

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


@pytest.mark.slow
def test_two_process_full_rank_t_matches_single_process():
    """The precision-sensitive path (full-rank t: Cholesky transform +
    pinned-matmul Mahalanobis) across a real process boundary
    (round-3 review item 7)."""
    outs = _run_two_process('fullrank')
    _assert_ranks_agree(outs, ('d2', 'W2', 'mean_error', 'khat',
                               'psis_mean', 'psis_cov_tr'))

    import jax.numpy as jnp
    from viabel_tpu import t_variational_family
    from viabel_tpu.models import robust_regression_model
    from viabel_tpu.parallel import (make_mesh, psislw_sharded,
                                     sharded_all_bounds,
                                     sharded_psis_moments)
    model = robust_regression_model()
    fam = t_variational_family(model.dim, 40)
    vp = jnp.concatenate([
        jnp.asarray(model.true_mean, dtype=jnp.float64),
        jnp.asarray([-1.8, 0.3, -1.9])])
    mesh = make_mesh(axis_names=('sample',), devices=jax.devices()[:4])
    ref, lw, samples = sharded_all_bounds(
        model.log_prob, fam, vp, 40000, jax.random.PRNGKey(3), mesh,
        moment_bound_fn=lambda p: float(fam.pth_moment(vp, p)),
        q_var=np.asarray(fam.mean_and_cov(vp)[1]),
        return_log_weights=True, return_samples=True)
    slw, khat_ref = psislw_sharded(lw, mesh)
    psis_mean_ref, _ = sharded_psis_moments(samples, slw, mesh)
    np.testing.assert_allclose(outs[0]['d2'], ref['d2'], rtol=1e-12)
    np.testing.assert_allclose(outs[0]['W2'], ref['W2'], rtol=1e-12)
    np.testing.assert_allclose(outs[0]['khat'], float(khat_ref), rtol=1e-12)
    np.testing.assert_allclose(outs[0]['psis_mean'],
                               np.asarray(psis_mean_ref), rtol=1e-12)


@pytest.mark.slow
def test_two_process_psisloo_matches_single_process():
    """Column-stacked PSIS-LOO across the process boundary (round-3 review
    item 7): per-point tails gathered over Gloo, loo/ks replicated."""
    outs = _run_two_process('psisloo')
    _assert_ranks_agree(outs, ('loo', 'loos', 'ks'))

    import jax.numpy as jnp
    from viabel_tpu.parallel import make_mesh, psisloo_sharded, shard_over
    mesh = make_mesh(axis_names=('sample',), devices=jax.devices()[:4])
    key = jax.random.PRNGKey(7)
    draws = jax.random.normal(key, (20000, 1), dtype=jnp.float64)
    y = jnp.linspace(-1.0, 1.0, 5)[None, :]
    log_lik = -0.5 * (draws - y) ** 2 - 0.5 * jnp.log(2 * jnp.pi)
    log_lik = shard_over(log_lik, mesh, 'sample')
    loo_ref, loos_ref, ks_ref = psisloo_sharded(log_lik, mesh)
    np.testing.assert_allclose(outs[0]['loo'], loo_ref, rtol=1e-12)
    np.testing.assert_allclose(outs[0]['loos'], np.asarray(loos_ref),
                               rtol=1e-12)
    np.testing.assert_allclose(outs[0]['ks'], np.asarray(ks_ref),
                               rtol=1e-10)


@pytest.mark.slow
def test_two_process_multistart2d_matches_single_process():
    """The flagship 2-D fused multistart — starts over `chain` x per-start
    bounds over `sample` — across a REAL process boundary (round-3 review
    item 1: 'the production pod layout was validated only in
    single-process shard_map').  Both ranks must agree bit-for-bit with
    each other and with the single-process 2x2-mesh run."""
    outs = _run_two_process('multistart2d')
    _assert_ranks_agree(outs, ('best', 'd2', 'khat', 'opt_param',
                               'psis_mean'))

    import jax.numpy as jnp
    from viabel_tpu import (black_box_klvi, init_from_moments,
                            mean_field_t_variational_family,
                            validated_vi_multistart)
    from viabel_tpu.models import eight_schools_ncp_model
    from viabel_tpu.parallel import make_mesh
    model = eight_schools_ncp_model()
    fam = mean_field_t_variational_family(model.dim, 40)
    obj = black_box_klvi(fam, model.log_prob, 16)
    init = init_from_moments(fam, model.true_mean,
                             model.true_cov).astype(jnp.float64)
    mesh = make_mesh(axis_names=('chain', 'sample'), shape=(2, 2),
                     devices=jax.devices()[:4])
    ref = validated_vi_multistart(
        model.log_prob, fam, init, 100, n_starts=2, perturb_scale=0.05,
        objective_and_grad=obj, n_bound_samples=8000,
        key=jax.random.PRNGKey(4), mesh=mesh)
    assert outs[0]['best'] == ref['best']
    np.testing.assert_allclose(outs[0]['d2'],
                               [b['d2'] for b in ref['bounds']], rtol=1e-12)
    np.testing.assert_allclose(outs[0]['khat'], ref['khat'], rtol=1e-12)
    np.testing.assert_allclose(outs[0]['opt_param'],
                               np.asarray(ref['opt_param']), rtol=1e-12)
    np.testing.assert_allclose(outs[0]['psis_mean'],
                               np.asarray(ref['psis_mean']), rtol=1e-12)


@pytest.mark.slow
def test_two_process_sweep2d_matches_single_process():
    """The 2-D fused learning-rate sweep (rates over `chain` x per-rate
    bounds over `sample`) across a real process boundary — the sweep
    shares `_one_sharded_run` with the multistart, and this pins that the
    traced-rate variant crosses the boundary identically."""
    outs = _run_two_process('sweep2d')
    _assert_ranks_agree(outs, ('best', 'd2', 'khat', 'opt_param'))

    import jax.numpy as jnp
    from viabel_tpu import (black_box_klvi, init_from_moments,
                            mean_field_t_variational_family,
                            validated_vi_sweep)
    from viabel_tpu.models import eight_schools_ncp_model
    from viabel_tpu.parallel import make_mesh
    model = eight_schools_ncp_model()
    fam = mean_field_t_variational_family(model.dim, 40)
    obj = black_box_klvi(fam, model.log_prob, 16)
    init = init_from_moments(fam, model.true_mean,
                             model.true_cov).astype(jnp.float64)
    mesh = make_mesh(axis_names=('chain', 'sample'), shape=(2, 2),
                     devices=jax.devices()[:4])
    ref = validated_vi_sweep(
        model.log_prob, fam, init, 100, learning_rates=[0.005, 0.02],
        objective_and_grad=obj, n_bound_samples=8000,
        key=jax.random.PRNGKey(6), mesh=mesh)
    assert outs[0]['best'] == ref['best']
    np.testing.assert_allclose(outs[0]['d2'],
                               [b['d2'] for b in ref['bounds']], rtol=1e-12)
    np.testing.assert_allclose(outs[0]['opt_param'],
                               np.asarray(ref['opt_param']), rtol=1e-12)


@pytest.mark.slow
def test_two_process_ia_chains_match_single_process():
    """`rmsprop_IA_optimize_with_rhat(mesh=)` with the chain axis crossing
    the process boundary (round-3 review item 1): identical chains,
    histories, and R-hat log on both ranks and vs the single-process run."""
    outs = _run_two_process('ia_chains')
    _assert_ranks_agree(outs, ('final_param', 'chains_tail', 'value_tail',
                               'rhat_mean'))

    import jax.numpy as jnp
    from viabel_tpu import (black_box_klvi, init_from_moments,
                            mean_field_t_variational_family,
                            rmsprop_IA_optimize_with_rhat)
    from viabel_tpu.models import eight_schools_ncp_model
    from viabel_tpu.parallel import make_mesh
    model = eight_schools_ncp_model()
    fam = mean_field_t_variational_family(model.dim, 40)
    obj = black_box_klvi(fam, model.log_prob, 16)
    init = init_from_moments(fam, model.true_mean,
                             model.true_cov).astype(jnp.float64)
    mesh = make_mesh(axis_names=('chain', 'sample'), shape=(2, 2),
                     devices=jax.devices()[:4])
    ref = rmsprop_IA_optimize_with_rhat(
        100, obj, init, model.dim, key=jax.random.PRNGKey(0),
        n_optimisers=2, rhat_window=50, tail_avg_iters=50, mesh=mesh)
    np.testing.assert_allclose(outs[0]['final_param'], np.asarray(ref[0]),
                               rtol=1e-12)
    assert tuple(outs[0]['chains_shape']) == np.asarray(ref[1]).shape
    np.testing.assert_allclose(outs[0]['chains_tail'],
                               np.asarray(ref[1])[:, -1], rtol=1e-12)
    np.testing.assert_allclose(outs[0]['rhat_mean'],
                               np.asarray(ref[6]['r_hat_mean']), rtol=1e-12)
