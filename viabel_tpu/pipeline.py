"""Single-dispatch validated VI: the whole workflow in one XLA program.

The reference's workflow — optimize, then draw bound samples, then compute
bounds, then PSIS-correct (reference: notebooks/experiments.py:138-180) —
issues many separate device programs; in this repo's multi-call form the
wall clock is dominated by per-dispatch host latency rather than device
time (benchmarks/pallas_study.py measures the dispatch floor).  This module
compiles the *entire* pipeline — the full optimizer `lax.scan`, the fused
draw+score pass, the log-weight/moment statistics, and PSIS smoothing —
into ONE program, so the host pays a single dispatch and the device runs
everything back-to-back out of HBM.

Only scalar bound arithmetic (`divergence_bound` -> `wasserstein_bounds`
-> `error_bounds` assembly) runs on the host afterwards, on already-reduced
statistics.
"""
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .bounds import (divergence_bound, error_bounds, log_weight_stats,
                     wasserstein_bounds)
from .objectives import black_box_klvi
from .optimizers import _adagrad_run, _wrap_objective
from .psis import _psislw_1d, _tail_len

__all__ = ['validated_vi']


@lru_cache(maxsize=256)
def _default_objective(var_family, log_density, n_mc_samples):
    """Cached KLVI factory so repeated `validated_vi` calls with the same
    (family, density, n) reuse one objective instance — a distinct instance
    is a distinct static jit argument and would recompile the pipeline
    (see CLAUDE.md conventions / `optimizers._wrap_objective`)."""
    presampled = var_family.base_sample is not None
    return black_box_klvi(var_family, log_density, n_mc_samples,
                          presampled=presampled)


# order of the scalar pack fetched to the host in ONE transfer (each
# individual device->host scalar fetch pays the tunnel's dispatch-latency
# floor; see CLAUDE.md / benchmarks/pallas_study.py)
_PACK_FIELDS = ('log_rescale', 'mean_rescaled_alpha', 'std_rescaled_alpha',
                'mean_lw', 'std_lw')


def _pack_host_scalars(stats, moments, khat, q_cov):
    scalars = jnp.stack([stats[f] for f in _PACK_FIELDS]
                        + [moments[2], moments[4], khat])
    return jnp.concatenate([scalars, jnp.ravel(q_cov).astype(scalars.dtype)])


def _unpack_host_scalars(pack, n, dim):
    pack = np.asarray(pack)
    head = [float(v) for v in pack[:8]]
    stats = dict(zip(_PACK_FIELDS, head[:5]), n=n)
    moments = {2: head[5], 4: head[6]}
    q_cov = pack[8:].reshape(dim, dim)
    return stats, moments, head[7], q_cov


@partial(jax.jit, static_argnames=(
    'obj', 'var_family', 'log_density', 'n_iters', 'n_bound_samples',
    'window', 'learning_rate', 'epsilon', 'learning_rate_end', 'alpha',
    'unroll', 'tail_len'))
def _pipeline_run(obj, var_family, log_density, n_iters, n_bound_samples,
                  window, learning_rate, epsilon, learning_rate_end,
                  alpha, unroll, tail_len, init_param, key):
    """The one compiled program: optimize -> draw -> score -> stats -> PSIS.

    Covers the same work as `adagrad_optimize` +
    `experiments.get_samples_and_log_weights` + `bounds.log_weight_stats` +
    `psis.psislw` + `experiments.improve_with_psis`'s weighted moments
    (reference: notebooks/experiments.py:138-180), fused end to end.
    """
    opt_key, draw_key = jax.random.split(key)
    values, log_norms, params = _adagrad_run(
        obj, n_iters, window, learning_rate, epsilon, learning_rate_end,
        init_param, opt_key, False, unroll)
    # tail-quarter iterate averaging (reference: viabel/vb.py:375-376)
    opt_param = jnp.mean(params[3 * n_iters // 4:], axis=0)

    samples = var_family.sample(draw_key, opt_param, n_bound_samples)
    lw = log_density(samples) - var_family.log_prob(opt_param, samples)
    stats = log_weight_stats(lw, alpha=alpha)
    q_mean, q_cov = var_family.mean_and_cov(opt_param)
    moments = {2: var_family.pth_moment(opt_param, 2),
               4: var_family.pth_moment(opt_param, 4)}

    slw, khat = _psislw_1d(lw, tail_len)
    # PSIS-corrected moments (slw is already self-normalized)
    w = jnp.exp(slw)
    psis_mean = w @ samples
    c = samples - psis_mean[None, :]
    psis_cov = (w[:, None] * c).T @ c

    return dict(opt_param=opt_param, value_history=values,
                log_norm_history=log_norms, q_mean=q_mean,
                q_cov=q_cov, log_weights=lw,
                smoothed_log_weights=slw, khat=khat, psis_mean=psis_mean,
                psis_cov=psis_cov,
                host_pack=_pack_host_scalars(stats, moments, khat, q_cov))


@partial(jax.jit, static_argnames=(
    'obj', 'var_family', 'log_density', 'n_iters', 'n_bound_samples',
    'window', 'learning_rate', 'epsilon', 'learning_rate_end', 'alpha',
    'unroll', 'mesh', 'axis'))
def _pipeline_run_sharded(obj, var_family, log_density, n_iters,
                          n_bound_samples, window, learning_rate, epsilon,
                          learning_rate_end, alpha, unroll, mesh, axis,
                          init_param, key):
    """Mesh-sharded single program: the optimizer scan runs replicated
    (variational parameters are tiny), then each device draws and scores
    only its shard of the bound samples; statistics, the PSIS tail fit, and
    the corrected moments ride ICI collectives (`viabel_tpu.parallel`).
    Same per-device key discipline as `sharded_all_bounds`, so results are
    bit-identical to composing the sharded estimators by hand.
    """
    from jax.sharding import PartitionSpec as P
    from .parallel.sharded_bounds import _stats_from_locals
    from .parallel.sharded_psis import psislw_sharded, sharded_psis_moments

    opt_key, draw_key = jax.random.split(key)
    values, log_norms, params = _adagrad_run(
        obj, n_iters, window, learning_rate, epsilon, learning_rate_end,
        init_param, opt_key, False, unroll)
    opt_param = jnp.mean(params[3 * n_iters // 4:], axis=0)

    n_local = n_bound_samples // mesh.shape[axis]

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P()),
             out_specs=(P(), P(axis), P(axis, None)))
    def local_draw(vp, k):
        idx = jax.lax.axis_index(axis)
        k_local = jax.random.fold_in(k, idx)
        samples = var_family.sample(k_local, vp, n_local)
        lw_local = log_density(samples) - var_family.log_prob(vp, samples)
        stats = _stats_from_locals(lw_local, alpha, n_bound_samples, axis)
        return stats, lw_local, samples

    stats, lw, samples = local_draw(opt_param, draw_key)
    slw, khat = psislw_sharded(lw, mesh, axis=axis)
    psis_mean, psis_cov = sharded_psis_moments(samples, slw, mesh, axis=axis)
    q_mean, q_cov = var_family.mean_and_cov(opt_param)
    moments = {2: var_family.pth_moment(opt_param, 2),
               4: var_family.pth_moment(opt_param, 4)}
    return dict(opt_param=opt_param, value_history=values,
                log_norm_history=log_norms, q_mean=q_mean,
                q_cov=q_cov, log_weights=lw,
                smoothed_log_weights=slw, khat=khat, psis_mean=psis_mean,
                psis_cov=psis_cov,
                host_pack=_pack_host_scalars(stats, moments, khat, q_cov))


def validated_vi(log_density, var_family, init_param, n_iters, *,
                 objective_and_grad=None, n_mc_samples=100,
                 n_bound_samples=1000000, alpha=2.0, key=None,
                 has_log_norm=None, window=10, learning_rate=0.01,
                 epsilon=0.1, learning_rate_end=None, unroll=4,
                 log_norm_bound=None, mesh=None, axis='sample'):
    """Run the full validated-VI pipeline as one compiled device program.

    Optimizes with windowed adagrad, estimates the error bounds from
    `n_bound_samples` Monte Carlo log-weights, and PSIS-corrects the
    posterior moments — the complete workflow of the reference harness
    (reference: notebooks/experiments.py:138-180) in a single dispatch.

    Parameters
    ----------
    objective_and_grad : optional
        Objective to optimize; defaults to KLVI on (`var_family`,
        `log_density`, `n_mc_samples`), pre-sampled when the family
        supports it.  Pass `black_box_chivi(...)` (with `log_norm_bound`
        from a KLVI run) for the reference's CHIVI stage
        (reference: notebooks/experiments.py:205-208).
    log_norm_bound : optional float
        Log-normalizer lower bound for the divergence bound; defaults to
        the run's own ELBO estimate (reference: viabel/bounds.py:174-176).
    mesh : optional jax.sharding.Mesh
        Shard the bound pass, PSIS, and moment correction over the mesh's
        `axis` (one fused program across all devices; samples and
        log-weights never leave their device).  `axis` must divide
        `n_bound_samples`.

    Returns
    -------
    dict with keys ``opt_param``, ``value_history``, ``log_norm_history``,
    ``bounds`` (the `all_bounds` dict), ``khat``, ``psis_mean``,
    ``psis_cov``, ``q_mean``, ``q_cov``, ``log_weights``,
    ``smoothed_log_weights``.  Array entries are device arrays; bound
    entries are floats.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if objective_and_grad is None:
        objective_and_grad = _default_objective(var_family, log_density,
                                                n_mc_samples)
    obj = _wrap_objective(objective_and_grad, has_log_norm)
    init_param = jnp.asarray(init_param)
    if mesh is not None:
        if n_bound_samples % mesh.shape[axis]:
            raise ValueError('the mesh axis size ({}) must divide '
                             'n_bound_samples ({})'.format(
                                 mesh.shape[axis], n_bound_samples))
        out = _pipeline_run_sharded(
            obj, var_family, log_density, n_iters, n_bound_samples, window,
            learning_rate, epsilon, learning_rate_end, alpha, unroll, mesh,
            axis, init_param, key)
    else:
        tail_len = _tail_len(n_bound_samples, 1.0)
        out = _pipeline_run(obj, var_family, log_density, n_iters,
                            n_bound_samples, window, learning_rate, epsilon,
                            learning_rate_end, alpha, unroll, tail_len,
                            init_param, key)

    # host: scalar bound assembly from the already-reduced statistics,
    # fetched in a single device->host transfer
    stats, moments, khat, q_cov = _unpack_host_scalars(
        out.pop('host_pack'), n_bound_samples, var_family.dim)
    d2, log_norm_bound = divergence_bound(
        None, alpha=alpha, log_norm_bound=log_norm_bound,
        return_log_norm_bound=True, _stats=stats)
    bounds = {}
    if alpha == 2:
        # Wasserstein / moment-error bounds are 2-divergence bounds only
        # (see `all_bounds`); for other orders just the divergence is valid
        bounds = wasserstein_bounds(d2, moment_bound_fn=moments.get)
        bounds.update(error_bounds(q_var=q_cov, **bounds))
    bounds['d2' if alpha == 2 else 'dalpha'] = d2
    bounds['log_norm_bound'] = log_norm_bound
    out['bounds'] = bounds
    out['khat'] = khat
    return out
