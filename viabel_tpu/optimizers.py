"""Stochastic optimizers for variational parameters.

TPU-native rebuild of the reference optimizers
(reference: viabel/vb.py:324-712).  The reference runs a Python loop calling
`objective_and_grad` once per iteration (~250 host dispatches/second is its
throughput ceiling; reference: viabel/vb.py:357-380).  Here the *entire*
optimization loop — sampling, density evaluation, reparameterization
gradient, windowed rescaling, and parameter update — is a single
`jax.lax.scan` compiled into one XLA program, so iterations run at device
speed with zero per-step host round-trips.  Multi-start "chains"
(`n_optimisers`), sequential in the reference (reference: viabel/vb.py:417,
582), are `vmap`-ed here and shard over a device mesh (see
`viabel_tpu.parallel`).

All optimizers accept `objective_and_grad(var_param, key)` returning
``(value, grad)`` or ``(value, grad, log_norm)``; pass `has_log_norm=True`
(or use an objective carrying the ``has_log_norm`` attribute, e.g.
`black_box_chivi`) for the 3-output form.
"""
from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .diagnostics import (compute_R_hat_adaptive, compute_R_hat_halfway,
                          stochastic_iterate_averaging)

__all__ = [
    'learning_rate_schedule',
    'adagrad_optimize',
    'rmsprop_IA_optimize_with_rhat',
    'adam_IA_optimize_with_rhat',
    'rmsprop_IA_optimize',
    'adam_IA_optimize',
]


def learning_rate_schedule(i, n_iters, learning_rate, learning_rate_end=None):
    """Learning rate at iteration `i` (pure function of `i`).

    Constant for the first quarter, harmonic ``a/(b + i)`` decay over the
    middle half, constant `learning_rate_end` for the last quarter —
    the reference expresses the same schedule as a generator
    (reference: viabel/vb.py:324-342).
    """
    if learning_rate <= 0:
        raise ValueError('learning rate must be positive')
    if learning_rate_end is None:
        return jnp.asarray(learning_rate)
    if learning_rate <= learning_rate_end:
        raise ValueError('initial learning rate must be greater than final '
                         'learning rate')
    b = n_iters * learning_rate_end / (2 * (learning_rate - learning_rate_end))
    a = learning_rate * b
    start_decrease_at = n_iters // 4
    end_decrease_at = 3 * n_iters // 4
    i = jnp.asarray(i)
    mid = a / (b + i - start_decrease_at + 1)
    return jnp.where(i < start_decrease_at, learning_rate,
                     jnp.where(i < end_decrease_at, mid, learning_rate_end))


def _copy_obj_attrs(src, dst):
    for attr in ('presampled', 'make_draws', 'make_draws_range'):
        if hasattr(src, attr):
            setattr(dst, attr, getattr(src, attr))
    return dst


@lru_cache(maxsize=256)
def _pad_objective(objective_and_grad):
    def wrapped(var_param, key):
        out = objective_and_grad(var_param, key)
        value, grad = out[0], out[1]
        return value, grad, jnp.zeros_like(value)
    return _copy_obj_attrs(objective_and_grad, wrapped)


@lru_cache(maxsize=256)
def _truncate_objective(objective_and_grad):
    def wrapped(var_param, key):
        out = objective_and_grad(var_param, key)
        return out[0], out[1], out[2]
    return _copy_obj_attrs(objective_and_grad, wrapped)


def _wrap_objective(objective_and_grad, has_log_norm):
    """Normalize an objective to the 3-output (value, grad, log_norm) form.

    Objectives may return (value, grad), (value, grad, log_norm), or longer
    tuples with extra diagnostics (e.g. `black_box_chivi_neff`'s n_eff).
    The wrappers are cached per underlying objective so the compiled
    optimizer runners (which treat the objective as a static argument) hit
    the jit cache on repeated calls.
    """
    if has_log_norm is None:
        has_log_norm = getattr(objective_and_grad, 'has_log_norm', False)
    if has_log_norm:
        return _truncate_objective(objective_and_grad)
    return _pad_objective(objective_and_grad)


class _WindowState(NamedTuple):
    """Ring buffer of recent gradients and log-norms
    (the reference keeps Python lists; reference: viabel/vb.py:364-373)."""
    grads: jnp.ndarray      # (window, P)
    log_norms: jnp.ndarray  # (window,)


def _window_accum(state, i, grad, log_norm, window):
    """Insert (grad, log_norm) and return (new_state, accum_sum).

    accum_sum = sum over the valid window of (exp(min log_norm - log_norm)
    * grad)^2, matching the reference's min-rescaled windowed adagrad
    denominator (reference: viabel/vb.py:371-373).  Slots not yet filled are
    masked out of the min and contribute zero.
    """
    slot = jnp.mod(i, window)
    grads = state.grads.at[slot].set(grad)
    log_norms = state.log_norms.at[slot].set(log_norm)
    valid = jnp.arange(window) < jnp.minimum(i + 1, window)
    masked_ln = jnp.where(valid, log_norms, jnp.inf)
    scale = jnp.where(valid, jnp.exp(jnp.min(masked_ln) - log_norms), 0.0)
    scaled = scale[:, None] * grads
    accum_sum = jnp.sum(scaled ** 2, axis=0)
    return _WindowState(grads, log_norms), accum_sum


def _progress_report(i, n_iters, value):
    """Host-side progress line (the reference uses tqdm with a running
    average-loss description; reference: viabel/vb.py:377-380)."""
    print('\r  iter {:>7d}/{} | loss = {:<12.6g}'.format(
        int(i) + 1, int(n_iters), float(value)),
        end='' if int(i) + 1 < int(n_iters) else '\n', flush=True)


@partial(jax.jit, static_argnames=('obj', 'n_iters', 'window',
                                   'learning_rate', 'epsilon',
                                   'learning_rate_end', 'progress'))
def _adagrad_run(obj, n_iters, window, learning_rate, epsilon,
                 learning_rate_end, init_param, key, progress=False):
    """Compiled whole-loop adagrad.  Static over the objective (a hashable
    function) and hyperparameters, so repeated calls with fresh
    params/keys hit the jit cache."""
    dtype = init_param.dtype
    P = init_param.shape[0]
    presampled = getattr(obj, 'presampled', False)

    def step(carry, xs):
        i, rng_or_draws = xs
        param, wstate = carry
        value, grad, log_norm = obj(param, rng_or_draws)
        wstate, accum_sum = _window_accum(wstate, i, grad, log_norm, window)
        lr = learning_rate_schedule(i, n_iters, learning_rate,
                                    learning_rate_end).astype(dtype)
        param = param - lr * grad / jnp.sqrt(epsilon + accum_sum)
        if progress:
            report_now = (jnp.mod(i, max(n_iters // 100, 1)) == 0) \
                | (i == n_iters - 1)
            jax.lax.cond(
                report_now,
                lambda: jax.debug.callback(_progress_report, i, n_iters,
                                           value),
                lambda: None)
        return (param, wstate), (value, log_norm, param)

    iters = jnp.arange(n_iters)
    if presampled:
        # all randomness generated in one batched call, outside the scan
        xs = (iters, obj.make_draws(key, n_iters, dtype))
    else:
        xs = (iters, jax.vmap(lambda i: jax.random.fold_in(key, i))(iters))
    wstate = _WindowState(jnp.zeros((window, P), dtype),
                          jnp.zeros((window,), dtype))
    (_, _), (values, log_norms, params) = jax.lax.scan(
        step, (init_param, wstate), xs)
    return values, log_norms, params


def adagrad_optimize(n_iters, objective_and_grad, init_param, *, key=None,
                     has_log_norm=None, window=10, learning_rate=.01,
                     epsilon=.1, learning_rate_end=None, progress=False):
    """Windowed adagrad with min-log-norm gradient rescaling and
    tail-quarter iterate averaging (reference: viabel/vb.py:345-389).

    The loop is one `lax.scan`; per-iteration PRNG keys are derived with
    `fold_in` from `key`.  Returns
    ``(smoothed_opt_param, variational_param_history, value_history,
    log_norm_history)`` where the parameter history covers the last quarter
    of iterations, as in the reference (reference: viabel/vb.py:375-376,
    386-388).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    obj = _wrap_objective(objective_and_grad, has_log_norm)
    init_param = jnp.asarray(init_param)
    values, log_norms, params = _adagrad_run(
        obj, n_iters, window, learning_rate, epsilon, learning_rate_end,
        init_param, key, progress)
    tail = params[3 * n_iters // 4:]
    smoothed_opt_param = jnp.mean(tail, axis=0)
    return smoothed_opt_param, tail, values, log_norms


def _perturbed_inits(init_param, n_optimisers, scale, key):
    """Chain inits: chain 0 unperturbed; chain o >= 1 gets
    ``init + N(0,1) * (o+1) * scale`` (reference: viabel/vb.py:417-421 with
    scale 0.5 for RMSProp, viabel/vb.py:582-586 with scale 0.2 for Adam)."""
    init_param = jnp.asarray(init_param)
    noise = jax.random.normal(key, (n_optimisers, init_param.shape[0]),
                              dtype=init_param.dtype)
    mult = (jnp.arange(n_optimisers, dtype=init_param.dtype) + 1) * scale
    mult = mult.at[0].set(0.0)
    return init_param[None, :] + noise * mult[:, None]


@partial(jax.jit, static_argnames=('obj', 'kind', 'n_iters', 'learning_rate',
                                   'epsilon', 'learning_rate_end'))
def _chains_run(obj, kind, n_iters, learning_rate, epsilon,
                learning_rate_end, inits, keys):
    """vmapped per-chain lax.scan, compiled once per (objective, config).

    TPU-native replacement for the reference's sequential
    ``for o in range(n_optimisers)`` loop (reference: viabel/vb.py:417, 582).
    `kind` selects the update rule: 'rmsprop' (EMA of squared grads,
    alpha=0.9; reference: viabel/vb.py:446-464) or 'adam' (bias-corrected
    moments with power i+2; reference: viabel/vb.py:611-623).  The history
    records pre-update parameters (reference: viabel/vb.py:466, 628).
    """
    alpha, beta1, beta2 = 0.9, 0.9, 0.999
    presampled = getattr(obj, 'presampled', False)

    def one_chain(init_param, chain_key):
        dtype = init_param.dtype
        P = init_param.shape[0]

        def step(carry, xs):
            i, rng_or_draws = xs
            param, v, m = carry
            value, grad, log_norm = obj(param, rng_or_draws)
            lr = learning_rate_schedule(i, n_iters, learning_rate,
                                        learning_rate_end).astype(dtype)
            if kind == 'rmsprop':
                v = jnp.where(i == 0, grad ** 2,
                              v * alpha + (1. - alpha) * grad ** 2)
                new_param = param - lr * grad / jnp.sqrt(epsilon + v)
            else:  # adam
                v = jnp.where(i == 0, 0.9 * grad ** 2,
                              v * beta2 + (1. - beta2) * grad ** 2)
                m = jnp.where(i == 0, 0.9 * grad,
                              m * beta1 + (1. - beta1) * grad)
                fi = (i + 2).astype(dtype)
                m_hat = m / (1 - beta1 ** fi)
                v_hat = v / (1 - beta2 ** fi)
                new_param = param - lr * m_hat / jnp.sqrt(epsilon + v_hat)
            return (new_param, v, m), (value, log_norm, param)

        iters = jnp.arange(n_iters)
        if presampled:
            xs = (iters, obj.make_draws(chain_key, n_iters, dtype))
        else:
            xs = (iters, jax.vmap(
                lambda i: jax.random.fold_in(chain_key, i))(iters))
        carry0 = (init_param, jnp.zeros((P,), dtype), jnp.zeros((P,), dtype))
        final_carry, ys = jax.lax.scan(step, carry0, xs)
        return ys, final_carry[0]

    return jax.vmap(one_chain)(inits, keys)


def _ia_postprocess(n_iters, K, chains, values, log_norms, rhat_window,
                    r_mean_threshold, r_sigma_threshold, tail_avg_iters):
    """R-hat-driven iterate-averaging post-pass shared by the RMSProp and
    Adam IA optimizers (reference: viabel/vb.py:487-549, 649-709).

    `chains` has shape (n_chains, n_iters, P) with the location block in
    ``[:, :, :K]`` and the scale block in ``[:, :, K:]``.
    """
    chains = np.asarray(chains)
    rhats = compute_R_hat_adaptive(chains, window_size=rhat_window)
    rhats_halfway = compute_R_hat_halfway(chains, interval=100, start=200)

    rhat_mean_windows, rhat_sigma_windows = rhats[:, :K], rhats[:, K:]
    rhat_mean_halfway = rhats_halfway[:, :K]
    rhat_sigma_halfway = rhats_halfway[:, K:]

    # First window index where two consecutive windows have all dims below
    # threshold sets the start of averaging (reference: viabel/vb.py:495-512;
    # clamped at 0 — the reference crashes when tail_avg_iters > n_iters).
    def find_start(windows, threshold):
        start = max(n_iters - tail_avg_iters, 0)
        for ee in range(windows.shape[0] - 1):
            if (windows[ee] < threshold).all() and \
               (windows[ee + 1] < threshold).all():
                return ee * rhat_window
        return start

    start_swa_m_iters = find_start(rhat_mean_windows, r_mean_threshold)
    start_swa_s_iters = find_start(rhat_sigma_windows, r_sigma_threshold)

    averaged_variational_mean_list = []
    averaged_variational_sigmas_list = []
    for o in range(chains.shape[0]):
        means_iters, _ = stochastic_iterate_averaging(
            chains[o, :, :K], start_swa_m_iters)
        sigmas_iters, _ = stochastic_iterate_averaging(
            chains[o, :, K:], start_swa_s_iters)
        averaged_variational_mean_list.append(means_iters)
        averaged_variational_sigmas_list.append(sigmas_iters)

    optimisation_log = dict(
        start_avg_mean_iters=start_swa_m_iters,
        start_avg_sigma_iters=start_swa_s_iters,
        r_hat_mean=rhat_mean_windows,
        r_hat_sigma=rhat_sigma_windows,
        r_hat_mean_halfway=rhat_mean_halfway,
        r_hat_sigma_halfway=rhat_sigma_halfway,
    )
    return (averaged_variational_mean_list, averaged_variational_sigmas_list,
            np.asarray(values).reshape(-1), np.asarray(log_norms).reshape(-1),
            optimisation_log)


def rmsprop_IA_optimize_with_rhat(n_iters, objective_and_grad, init_param, K,
                                  *, key=None, has_log_norm=None, window=500,
                                  learning_rate=.01, epsilon=.000001,
                                  rhat_window=500, averaging=True,
                                  n_optimisers=1, r_mean_threshold=1.15,
                                  r_sigma_threshold=1.20, tail_avg_iters=2000,
                                  learning_rate_end=None, mesh=None):
    """RMSProp with R-hat-gated iterate averaging over parallel chains
    (reference: viabel/vb.py:392-549).

    The per-step rule is an EMA of squared gradients (alpha = 0.9) as the
    adaptive denominator (reference: viabel/vb.py:446-464); the history
    records *pre-update* parameters (reference: viabel/vb.py:466).  The
    reference's ``avg_grad_norm=True`` branch is a no-op bug
    (``grad_norm*a+(1-a)*grad_norm``; reference: viabel/vb.py:454) and is
    intentionally not replicated.  Chains run vmapped, not sequentially.

    Returns the reference's 7-tuple:
    ``(variational_param, chains, averaged_means_list, averaged_sigmas_list,
    value_history, log_norm_history, optimisation_log)``.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    obj = _wrap_objective(objective_and_grad, has_log_norm)
    init_param = jnp.asarray(init_param)

    init_key, *chain_keys = jax.random.split(key, n_optimisers + 1)
    inits = _perturbed_inits(init_param, n_optimisers, 0.5, init_key)
    chain_keys = jnp.stack(chain_keys)
    if mesh is not None:
        from .parallel.sharded_chains import shard_chain_inputs
        inits, chain_keys = shard_chain_inputs(inits, chain_keys, mesh)

    (values, log_norms, chains), final_params = _chains_run(
        obj, 'rmsprop', n_iters, learning_rate, epsilon, learning_rate_end,
        inits, chain_keys)
    (avg_means, avg_sigmas, value_history, log_norm_history,
     optimisation_log) = _ia_postprocess(
        n_iters, K, chains, values, log_norms, rhat_window,
        r_mean_threshold, r_sigma_threshold, tail_avg_iters)
    # post-final-update parameter of the last chain, matching the reference
    # return (reference: viabel/vb.py:547)
    return (np.asarray(final_params)[-1], np.asarray(chains), avg_means,
            avg_sigmas, value_history, log_norm_history, optimisation_log)


def adam_IA_optimize_with_rhat(n_iters, objective_and_grad, init_param, K,
                               *, key=None, has_log_norm=None, window=500,
                               learning_rate=.01, epsilon=.000001,
                               rhat_window=500, averaging=True,
                               n_optimisers=1, r_mean_threshold=1.15,
                               r_sigma_threshold=1.20, tail_avg_iters=2000,
                               learning_rate_end=None, mesh=None):
    """Adam with R-hat-gated iterate averaging over parallel chains
    (reference: viabel/vb.py:554-712).

    Per-step rule: Adam moments with beta1=0.9, beta2=0.999, initialized at
    ``0.9*g`` / ``0.9*g^2`` and bias-corrected with power ``i+2``
    (reference: viabel/vb.py:611-623).  Chain inits perturbed with scale 0.2
    (reference: viabel/vb.py:586).  Returns the same 7-tuple as
    `rmsprop_IA_optimize_with_rhat`.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    obj = _wrap_objective(objective_and_grad, has_log_norm)
    init_param = jnp.asarray(init_param)

    init_key, *chain_keys = jax.random.split(key, n_optimisers + 1)
    inits = _perturbed_inits(init_param, n_optimisers, 0.2, init_key)
    chain_keys = jnp.stack(chain_keys)
    if mesh is not None:
        from .parallel.sharded_chains import shard_chain_inputs
        inits, chain_keys = shard_chain_inputs(inits, chain_keys, mesh)

    (values, log_norms, chains), final_params = _chains_run(
        obj, 'adam', n_iters, learning_rate, epsilon, learning_rate_end,
        inits, chain_keys)
    (avg_means, avg_sigmas, value_history, log_norm_history,
     optimisation_log) = _ia_postprocess(
        n_iters, K, chains, values, log_norms, rhat_window,
        r_mean_threshold, r_sigma_threshold, tail_avg_iters)
    return (np.asarray(final_params)[-1], np.asarray(chains), avg_means,
            avg_sigmas, value_history, log_norm_history, optimisation_log)


def rmsprop_IA_optimize(n_iters, objective_and_grad, init_param, K, *,
                        key=None, has_log_norm=None, learning_rate=.01,
                        epsilon=.000001, n_optimisers=1, tail_avg_iters=2000,
                        learning_rate_end=None):
    """RMSProp with plain tail iterate averaging — the non-R-hat variant the
    reference notebooks import from a sibling branch
    (reference: notebooks/robust-regression-model-example.ipynb cells 40-45;
    absent from the reference package — see SURVEY.md section 2.3)."""
    out = rmsprop_IA_optimize_with_rhat(
        n_iters, objective_and_grad, init_param, K, key=key,
        has_log_norm=has_log_norm, learning_rate=learning_rate,
        epsilon=epsilon, n_optimisers=n_optimisers,
        tail_avg_iters=tail_avg_iters, learning_rate_end=learning_rate_end,
        rhat_window=max(n_iters, 1))  # window > n_iters => no R-hat gating
    return out


def adam_IA_optimize(n_iters, objective_and_grad, init_param, K, *,
                     key=None, has_log_norm=None, learning_rate=.01,
                     epsilon=.000001, n_optimisers=1, tail_avg_iters=2000,
                     learning_rate_end=None):
    """Adam with plain tail iterate averaging (non-R-hat variant; see
    `rmsprop_IA_optimize`)."""
    return adam_IA_optimize_with_rhat(
        n_iters, objective_and_grad, init_param, K, key=key,
        has_log_norm=has_log_norm, learning_rate=learning_rate,
        epsilon=epsilon, n_optimisers=n_optimisers,
        tail_avg_iters=tail_avg_iters, learning_rate_end=learning_rate_end,
        rhat_window=max(n_iters, 1))
