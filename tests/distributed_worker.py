"""Subprocess worker for test_distributed.py: run the shipped sharded
programs under a REAL multi-process `jax.distributed` setup (each OS
process owns 2 CPU devices; collectives cross the process boundary over
Gloo — the same program structure that runs over ICI/DCN on a pod slice).

Prints one JSON line with the results; the parent compares them against
the identical single-process 4-device computation (per-device PRNG keys
depend only on the mesh axis index, so the numbers must match).

Modes (argv[4], default ``bounds``):

* ``bounds`` — `sharded_all_bounds` + `psislw_sharded` +
  `sharded_psis_moments` on the mean-field funnel (sample-axis only).
* ``fullrank`` — the same estimator stack on a full-rank Student-t family
  (the precision-sensitive path: Cholesky transform + pinned-matmul
  Mahalanobis; round-3 review item 7).
* ``psisloo`` — column-stacked `psisloo_sharded` (draws sharded over the
  mesh, per-point tails gathered; round-3 review item 7).
* ``multistart2d`` — the flagship 2-D program: a 2x2 ``(chain, sample)``
  mesh across the 2 processes runs `validated_vi_multistart(mesh=)`
  with starts partitioned over `chain` AND per-start bounds sharded over
  `sample` in ONE fused program (round-3 review item 1).
* ``sweep2d`` — the same 2-D layout for `validated_vi_sweep(mesh=)`
  (rates over `chain` x per-rate bounds over `sample`).
* ``ia_chains`` — `rmsprop_IA_optimize_with_rhat(mesh=)`: the production
  chains runner with the chain axis spanning the process boundary
  (round-3 review item 1).
"""
import json
import os
import sys


def _bounds_case(jax, jnp, np, mesh_axes):
    from viabel_tpu import mean_field_gaussian_variational_family
    from viabel_tpu.models import funnel_model
    from viabel_tpu.parallel import (make_mesh, psislw_sharded,
                                     sharded_all_bounds,
                                     sharded_psis_moments)
    model = funnel_model()
    fam = mean_field_gaussian_variational_family(2)
    vp = jnp.asarray([0.0, 0.0, 0.3, -0.2])
    mesh = make_mesh(axis_names=('sample',))  # all 4 global devices
    res, lw, samples = sharded_all_bounds(
        model.log_prob, fam, vp, 40000, jax.random.PRNGKey(0), mesh,
        moment_bound_fn=lambda p: float(fam.pth_moment(vp, p)),
        q_var=np.asarray(fam.mean_and_cov(vp)[1]),
        return_log_weights=True, return_samples=True)
    slw, khat = psislw_sharded(lw, mesh)
    psis_mean, psis_cov = sharded_psis_moments(samples, slw, mesh)
    return dict(
        d2=float(res['d2']), W2=float(res['W2']),
        mean_error=float(res['mean_error']), khat=float(khat),
        psis_mean=[float(v) for v in psis_mean],
        psis_cov_tr=float(jnp.trace(psis_cov)))


def _fullrank_case(jax, jnp, np, mesh_axes):
    """Full-rank t on the robust-regression posterior: the family whose
    statistics the round-3 precision pin rescued (Cholesky transform +
    HIGHEST-precision Mahalanobis matmuls), now witnessed across a real
    process boundary."""
    from viabel_tpu import t_variational_family
    from viabel_tpu.models import robust_regression_model
    from viabel_tpu.parallel import (make_mesh, psislw_sharded,
                                     sharded_all_bounds,
                                     sharded_psis_moments)
    model = robust_regression_model()
    fam = t_variational_family(model.dim, 40)
    # a fitted-shape parameter: true mean, mild correlated scale
    vp = jnp.concatenate([
        jnp.asarray(model.true_mean, dtype=jnp.float64),
        jnp.asarray([-1.8, 0.3, -1.9])])  # log-diag + off-diag Cholesky
    mesh = make_mesh(axis_names=('sample',))
    res, lw, samples = sharded_all_bounds(
        model.log_prob, fam, vp, 40000, jax.random.PRNGKey(3), mesh,
        moment_bound_fn=lambda p: float(fam.pth_moment(vp, p)),
        q_var=np.asarray(fam.mean_and_cov(vp)[1]),
        return_log_weights=True, return_samples=True)
    slw, khat = psislw_sharded(lw, mesh)
    psis_mean, psis_cov = sharded_psis_moments(samples, slw, mesh)
    return dict(
        d2=float(res['d2']), W2=float(res['W2']),
        mean_error=float(res['mean_error']), khat=float(khat),
        psis_mean=[float(v) for v in psis_mean],
        psis_cov_tr=float(jnp.trace(psis_cov)))


def _psisloo_case(jax, jnp, np, mesh_axes):
    """Column-stacked PSIS-LOO: a (n_draws, n_points) log-likelihood
    matrix sharded over the draw axis, each point's tail gathered."""
    from viabel_tpu.parallel import make_mesh, psisloo_sharded
    mesh = make_mesh(axis_names=('sample',))
    key = jax.random.PRNGKey(7)
    # synthetic but deterministic: per-point Gaussian log-likelihoods
    draws = jax.random.normal(key, (20000, 1), dtype=jnp.float64)
    y = jnp.linspace(-1.0, 1.0, 5)[None, :]
    log_lik = -0.5 * (draws - y) ** 2 - 0.5 * jnp.log(2 * jnp.pi)
    from viabel_tpu.parallel import shard_over
    log_lik = shard_over(log_lik, mesh, 'sample')
    loo, loos, ks = psisloo_sharded(log_lik, mesh)
    return dict(loo=float(loo), loos=[float(v) for v in loos],
                ks=[float(v) for v in ks])


def _multistart2d_case(jax, jnp, np, mesh_axes):
    """The production pod layout in one fused program, across the process
    boundary: starts over `chain` x per-start bounds over `sample` on a
    2x2 mesh whose chain rows live on different processes."""
    from viabel_tpu import (black_box_klvi, init_from_moments,
                            mean_field_t_variational_family,
                            validated_vi_multistart)
    from viabel_tpu.models import eight_schools_ncp_model
    from viabel_tpu.parallel import fetch_global, make_mesh
    model = eight_schools_ncp_model()
    fam = mean_field_t_variational_family(model.dim, 40)
    obj = black_box_klvi(fam, model.log_prob, 16)
    init = init_from_moments(fam, model.true_mean,
                             model.true_cov).astype(jnp.float64)
    mesh = make_mesh(axis_names=('chain', 'sample'), shape=(2, 2))
    out = validated_vi_multistart(
        model.log_prob, fam, init, 100, n_starts=2, perturb_scale=0.05,
        objective_and_grad=obj, n_bound_samples=8000,
        key=jax.random.PRNGKey(4), mesh=mesh)
    spec = tuple(out['log_weights'].sharding.spec)
    assert spec == ('chain', 'sample'), spec
    return dict(
        best=int(out['best']),
        d2=[float(b['d2']) for b in out['bounds']],
        khat=[float(k) for k in out['khat']],
        opt_param=fetch_global(out['opt_param']).tolist(),
        psis_mean=fetch_global(out['psis_mean']).tolist())


def _sweep2d_case(jax, jnp, np, mesh_axes):
    """The 2-D fused learning-rate sweep across the process boundary:
    rates over `chain` x per-rate bounds over `sample` on a 2x2 mesh."""
    from viabel_tpu import (black_box_klvi, init_from_moments,
                            mean_field_t_variational_family,
                            validated_vi_sweep)
    from viabel_tpu.models import eight_schools_ncp_model
    from viabel_tpu.parallel import fetch_global, make_mesh
    model = eight_schools_ncp_model()
    fam = mean_field_t_variational_family(model.dim, 40)
    obj = black_box_klvi(fam, model.log_prob, 16)
    init = init_from_moments(fam, model.true_mean,
                             model.true_cov).astype(jnp.float64)
    mesh = make_mesh(axis_names=('chain', 'sample'), shape=(2, 2))
    out = validated_vi_sweep(
        model.log_prob, fam, init, 100, learning_rates=[0.005, 0.02],
        objective_and_grad=obj, n_bound_samples=8000,
        key=jax.random.PRNGKey(6), mesh=mesh)
    spec = tuple(out['log_weights'].sharding.spec)
    assert spec == ('chain', 'sample'), spec
    return dict(
        best=int(out['best']),
        d2=[float(b['d2']) for b in out['bounds']],
        khat=[float(k) for k in out['khat']],
        opt_param=fetch_global(out['opt_param']).tolist())


def _ia_chains_case(jax, jnp, np, mesh_axes):
    """The production chains runner with the chain axis crossing the
    process boundary; every rank must report the identical R-hat log and
    histories (they are gathered via fetch_global)."""
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
    mesh = make_mesh(axis_names=('chain', 'sample'), shape=(2, 2))
    out = rmsprop_IA_optimize_with_rhat(
        100, obj, init, model.dim, key=jax.random.PRNGKey(0),
        n_optimisers=2, rhat_window=50, tail_avg_iters=50, mesh=mesh)
    final_param, chains = np.asarray(out[0]), np.asarray(out[1])
    return dict(
        final_param=final_param.tolist(),
        chains_shape=list(chains.shape),
        chains_tail=chains[:, -1].tolist(),
        value_tail=np.asarray(out[4])[-4:].tolist(),
        rhat_mean=np.asarray(out[6]['r_hat_mean']).tolist())


_CASES = dict(bounds=_bounds_case, fullrank=_fullrank_case,
              psisloo=_psisloo_case, multistart2d=_multistart2d_case,
              sweep2d=_sweep2d_case, ia_chains=_ia_chains_case)


def main():
    proc_id, n_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else 'bounds'
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    from viabel_tpu.parallel import initialize_distributed
    info = initialize_distributed('127.0.0.1:' + port, n_procs, proc_id)
    assert info['global_devices'] == 2 * n_procs, info

    import jax.numpy as jnp
    import numpy as np

    result = _CASES[mode](jax, jnp, np, None)
    result.update(proc=proc_id, n_global=info['global_devices'],
                  n_local=info['local_devices'])
    print(json.dumps(result), flush=True)


if __name__ == '__main__':
    main()
