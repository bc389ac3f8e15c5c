"""Validated posterior error bounds (the installable core).

TPU-native rebuild of the reference bounds module
(reference: viabel/bounds.py:13-213; the only module exported by
viabel/__init__.py:1).  Given Monte Carlo log-weights
``log p(x_i) - log q(x_i)`` for samples ``x_i ~ q`` it computes

* a bound on the alpha-(Renyi/chi^2) divergence from the CUBO/ELBO gap
  (`divergence_bound`, reference: viabel/bounds.py:142-180),
* 1-/2-Wasserstein bounds from the 2-divergence and (empirical or supplied)
  centered moments (`wasserstein_bounds`, reference: viabel/bounds.py:103-139),
* bounds on the posterior mean/stdev/covariance estimation error
  (`error_bounds`, reference: viabel/bounds.py:64-100, 195-213),

orchestrated by `all_bounds` (reference: viabel/bounds.py:13-61).

TPU-first design notes
----------------------
The reference makes several numpy passes over the 1e6-2.5e6-element
log-weight vector (max, exp, mean, std; reference: viabel/bounds.py:169-176,
183-192).  Here all sample-axis statistics are produced by a single fused,
jitted reduction (`log_weight_stats`) so the array is read from HBM once;
the same kernel runs sharded over a device mesh with `psum` reductions in
`viabel_tpu.parallel.sharded_bounds`.  The scalar bound algebra stays in
Python/numpy — there is nothing to accelerate there.
"""
import math
from functools import lru_cache, partial
from warnings import warn

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'all_bounds',
    'error_bounds',
    'wasserstein_bounds',
    'divergence_bound',
    'log_weight_stats',
    'central_moments',
    'family_moment_bounds',
    'MonteCarloErrorWarning',
]


@lru_cache(maxsize=64)
def _family_moments_prog(family):
    return jax.jit(lambda vp: jnp.stack([family.pth_moment(vp, 2),
                                         family.pth_moment(vp, 4)]))


# family identities whose `pth_moment(-, 4)` raised the no-closed-form
# guard: the guard is static family metadata (`df <= p` is checked before
# any array work), so the verdict is cached and later calls skip the failed
# re-trace — a failed trace is NOT cached by jax.jit, so without this every
# serve /bounds or CLI bound pass on a df <= 4 family would re-trace just
# to raise and catch.  An LRU OrderedDict (not a capped set): hot families
# stay cached and cold ones are evicted, instead of new families being
# rejected once the cap fills and then paying the failed re-trace per call
# on a serve hot path (round-5 advisor finding).  Capacity parallels the
# lru_cache(64) of `_family_moments_prog` (same keys, same lifetime
# expectations).
import threading
from collections import OrderedDict  # noqa: E402

_families_without_closed_moments = OrderedDict()
_NO_CLOSED_MOMENTS_CAP = 64
_no_closed_moments_lock = threading.Lock()


def family_moment_bounds(family, var_param):
    """A `moment_bound_fn` backed by the family's closed-form moments.

    Evaluates both `pth_moment(var_param, 2)` and `pth_moment(var_param, 4)`
    in ONE cached compiled program and fetches both scalars in ONE transfer
    — eager per-scalar evaluation pays the tunnel's ~25-35 ms dispatch floor
    per op (CLAUDE.md).  The compiled program is cached per family identity
    (the `_pad_objective` convention; the family constructors are memoized,
    so reconstructing a family hits the same cache entry).

    Returns ``None`` when the family has no finite closed-form 4th moment
    (a Student-t with 2 < df <= 4, which the constructors accept) — callers
    then fall back to empirical central moments of the bound samples, the
    same fallback `all_bounds(samples=...)`, `sharded_all_bounds`
    (``moment_bound_fn=None``), and the fused pipeline apply (round-4
    review: this used to raise out of serve /bounds and the CLI bound
    stage for df <= 4 families).  Only `families.NoClosedFormMomentError`
    maps to the fallback — any other error from a family's `pth_moment`
    propagates (round-4/5 reviews: a blanket except masked real defects in
    custom families, and a message-substring match was one rewording away
    from the same regression).
    """
    from .families import NoClosedFormMomentError
    with _no_closed_moments_lock:
        # one lock around check+move and insert+evict: serve's threaded
        # handlers call this concurrently, and an unsynchronized
        # move_to_end can KeyError when another thread's insert just
        # evicted the key (round-5 review)
        if family in _families_without_closed_moments:
            _families_without_closed_moments.move_to_end(family)
            return None
    try:
        c2, c4 = np.asarray(_family_moments_prog(family)(var_param),
                            dtype=float)
    except NoClosedFormMomentError:  # families.pth_moment's static guard
        with _no_closed_moments_lock:
            _families_without_closed_moments[family] = True
            if len(_families_without_closed_moments) > _NO_CLOSED_MOMENTS_CAP:
                _families_without_closed_moments.popitem(last=False)
        return None
    moments = {2: c2, 4: c4}
    return lambda p: moments[p]


class MonteCarloErrorWarning(UserWarning):
    """Raised (as a warning) when a Monte Carlo bound estimate's standard
    error exceeds the reference's 0.01 threshold
    (reference: viabel/bounds.py:183-192).  A dedicated category so callers
    running deliberately small-sample passes (tests, smoke runs) can filter
    it precisely instead of suppressing all UserWarnings."""


@partial(jax.jit, static_argnames=('alpha',))
def _log_weight_stats_arrays(log_weights, alpha):
    lw = jnp.ravel(log_weights)
    log_rescale = jnp.max(lw)
    w_alpha = jnp.exp(lw - log_rescale) ** alpha
    return dict(
        log_rescale=log_rescale,
        mean_rescaled_alpha=jnp.mean(w_alpha),
        std_rescaled_alpha=jnp.std(w_alpha),
        mean_lw=jnp.mean(lw),
        std_lw=jnp.std(lw),
    )


def log_weight_stats(log_weights, alpha=2.0):
    """Fused single-pass statistics of a log-weight vector.

    Returns a dict with ``log_rescale`` (max), ``mean_rescaled_alpha`` and
    ``std_rescaled_alpha`` (moments of ``exp(lw - max)**alpha``), and
    ``mean_lw`` / ``std_lw`` (moments of the raw log-weights).  These are all
    the sample statistics `divergence_bound` needs
    (reference: viabel/bounds.py:169-176 and the MC-error check at
    viabel/bounds.py:183-192), computed in one read of the array.

    The array statistics come out of one jitted program; ``n`` is attached
    OUTSIDE the jit as a host int, computed from the static shape —
    round-4 review: a jit-output ``n`` is a device scalar, and
    `divergence_bound`'s ``sqrt(n)`` then forced an extra blocking
    device->host fetch per call, past `_fetch_stats`'s one packed transfer.
    """
    out = dict(_log_weight_stats_arrays(log_weights, float(alpha)))
    out['n'] = int(np.prod(log_weights.shape))
    return out


@partial(jax.jit, static_argnames=('with_cov',))
def central_moments(samples, with_cov=True):
    """Empirical centered norm moments ``C_p = E[ ||x - mean||^p ]``.

    Computes C2 and C4 (the two moments `wasserstein_bounds` needs;
    reference: viabel/bounds.py:130-135) plus, when ``with_cov``, the sample
    covariance matrix (reference: viabel/bounds.py:55-56) in one pass over
    the samples.  Callers that already hold ``q_var`` pass
    ``with_cov=False`` — the ``(d, n) x (n, d)`` covariance matmul is the
    expensive part of this pass at production sample counts, and its result
    would be dead (round-4 review).

    The reference's empirical fallback computes ``E[sum_d c_d^4]`` for C4,
    which omits the cross terms of ``E[||c||^4]`` and therefore
    *underestimates* the 4th moment (an invalid "upper" bound) — while its
    own closed-form family ``pth_moment(4)`` implementations include them
    (e.g. viabel/vb.py:177-179).  Fixed here, not replicated (PARITY.md):
    C4 is the norm moment, consistent with every closed form.
    """
    x = jnp.atleast_2d(samples.T).T  # (n, d)
    mean = jnp.mean(x, axis=0, keepdims=True)
    c = x - mean
    norm2 = jnp.sum(c ** 2, axis=1)
    C2 = jnp.mean(norm2)
    C4 = jnp.mean(norm2 ** 2)
    out = dict(C2=C2, C4=C4)
    if with_cov:
        n = x.shape[0]
        # f32-pinned: TPU default matmul precision measurably shifts
        # converged statistics (families._mm); free at d <= ~30
        out['cov'] = jnp.matmul(c.T, c,
                                precision=jax.lax.Precision.HIGHEST) / (n - 1)
    return out


_STAT_KEYS = ('log_rescale', 'mean_rescaled_alpha', 'std_rescaled_alpha',
              'mean_lw', 'std_lw')


def _fetch_stats(stats):
    """Materialize a `log_weight_stats` dict on the host in ONE transfer.

    Each individual device->host scalar fetch pays this environment's
    dispatch-latency floor (CLAUDE.md; benchmarks/pallas_study.py), so the
    five statistics are stacked on device and fetched together.  Dicts that
    already hold host floats pass through unchanged."""
    if isinstance(stats['mean_lw'], (float, int)):
        return stats
    packed = np.asarray(jnp.stack([stats[k] for k in _STAT_KEYS]))
    out = dict(zip(_STAT_KEYS, (float(v) for v in packed)))
    out['n'] = stats['n']
    return out


def _check_mc_error(mean, stderr, atol=0.01, rtol=0.0, quantity_name=None):
    """Warn when the MC standard error is large.

    Mirrors `mean_and_check_mc_error` (reference: viabel/bounds.py:183-192)
    but takes precomputed statistics so it composes with the fused kernel.
    """
    if stderr > rtol * np.abs(mean) + atol:
        msg = 'significant Monte Carlo error'
        if quantity_name is not None:
            msg += ' when computing ' + quantity_name
        msg += ' (mean = {}, standard deviation = {})'.format(mean, stderr)
        warn(msg, MonteCarloErrorWarning)
    return mean


def divergence_bound(log_weights, alpha=2.0, log_norm_bound=None,
                     return_log_norm_bound=False, _stats=None):
    """Monte Carlo bound on the alpha-divergence ``D_alpha(q || p)``.

    ``d_alpha = alpha/(alpha-1) * (CUBO_alpha - log_norm_bound)`` where
    CUBO is estimated with max-rescaled exponentiated weights for stability
    and the ELBO (mean log-weight) is used as the log-normalizer lower bound
    when none is supplied (reference: viabel/bounds.py:142-180).

    Parameters mirror the reference; `_stats` optionally accepts a
    precomputed `log_weight_stats` dict (used by the sharded path, where the
    statistics were already reduced across the mesh).
    """
    if alpha <= 1:
        raise ValueError('alpha must be greater than 1')
    s = log_weight_stats(jnp.asarray(log_weights), alpha=alpha) \
        if _stats is None else _stats
    s = _fetch_stats(s)
    n = s['n']
    mean_rescaled = _check_mc_error(
        float(s['mean_rescaled_alpha']),
        float(s['std_rescaled_alpha']) / np.sqrt(n),
        quantity_name='CUBO')
    cubo = np.log(mean_rescaled) / alpha + float(s['log_rescale'])
    if log_norm_bound is None:
        log_norm_bound = _check_mc_error(
            float(s['mean_lw']), float(s['std_lw']) / np.sqrt(n),
            quantity_name='ELBO')
    dalpha = alpha / (alpha - 1) * (cubo - log_norm_bound)
    if return_log_norm_bound:
        return dalpha, log_norm_bound
    return dalpha


def wasserstein_bounds(d2, samples=None, moment_bound_fn=None, _moments=None):
    """Bounds on the 1- and 2-Wasserstein distances.

    ``W_p <= 2 * C_{2p}^{1/(2p)} * expm1(d2)^{1/(2p)}`` for p in {1, 2}
    (reference: viabel/bounds.py:103-139).  ``C_{2p}`` comes from
    `moment_bound_fn(2p)` if provided, else from centered empirical moments
    of `samples`.
    """
    results = dict()
    if moment_bound_fn is None:
        if samples is None and _moments is None:
            raise ValueError('must provide samples if moment_bound_fn not given')
        m = central_moments(jnp.asarray(samples)) if _moments is None else _moments
        if isinstance(m['C2'], (float, int)):
            moments = {2: m['C2'], 4: m['C4']}
        else:  # one transfer for both moments (dispatch-floor economy)
            c24 = np.asarray(jnp.stack([jnp.asarray(m['C2']),
                                        jnp.asarray(m['C4'])]))
            moments = {2: float(c24[0]), 4: float(c24[1])}
        moment_bound_fn = lambda p: moments[p]
    # d2 is a divergence, mathematically >= 0; a Monte Carlo estimate can
    # dip negative for near-exact fits (CUBO < ELBO by noise), and
    # expm1(d2)**0.5 would then be NaN.  Clamp to the honest degenerate
    # bound W_p = 0 instead (the reference, viabel/bounds.py:124, NaNs).
    d2 = max(float(d2), 0.0)
    for p in [1, 2]:
        Cp = float(moment_bound_fn(2 * p))
        # evaluated in log space: a large d2 (poor fit) overflows
        # np.expm1(d2) with a RuntimeWarning, whereas
        # log(expm1(d2)) = d2 + log1p(-exp(-d2)) stays finite
        if Cp < 0 or math.isnan(Cp) or math.isnan(d2):
            w = math.nan
        elif d2 == 0.0 or Cp == 0.0:
            w = 0.0
        else:
            # log(expm1(d2)): expm1 directly while it is representable
            # (accurate for tiny d2, where exp(-d2) rounds to 1.0 and the
            # log1p form would hit a domain error), switching to the
            # asymptotic form d2 + log1p(-exp(-d2)) before expm1 overflows
            if d2 < 700.0:
                log_em1 = math.log(math.expm1(d2))
            else:
                log_em1 = d2 + math.log1p(-math.exp(-d2))
            log_w = math.log(2.0) + (.5 / p) * (math.log(Cp) + log_em1)
            try:
                w = math.exp(log_w)
            except OverflowError:  # vacuous bound
                w = math.inf
        results['W{}'.format(p)] = w
    return results


def _compute_norm_if_needed(var):
    """Spectral norm of a covariance matrix, identity on scalars
    (reference: viabel/bounds.py:64-67)."""
    var = np.asarray(var)
    if var.ndim == 2:
        return np.linalg.norm(var, ord=2)
    return var


def mean_bound(Wp):
    """|E_p[x] - E_q[x]| <= W_p (reference: viabel/bounds.py:199-200)."""
    return Wp


def std_bound(W2):
    """Stdev error bound (reference: viabel/bounds.py:203-204)."""
    return W2


def var_bound(W2, var1, var2=None):
    """Covariance error bound ``2 (min_std W2 + W2^2)``
    (reference: viabel/bounds.py:207-213)."""
    if var2 is not None:
        min_var = np.min([var1, var2], axis=0)
    else:
        min_var = var1
    min_std = np.sqrt(min_var)
    # W2 can be astronomically large for a terrible fit; saturate the
    # square to inf (vacuous bound) instead of raising OverflowError
    W2 = np.float64(W2)
    with np.errstate(over='ignore'):
        return 2 * (min_std * W2 + W2 ** 2)


def error_bounds(W1=np.inf, W2=np.inf, q_var=np.inf, p_var=np.inf):
    """Mean / stdev / covariance error bounds from Wasserstein bounds
    (reference: viabel/bounds.py:70-100)."""
    results = dict()
    results['mean_error'] = mean_bound(min(W1, W2))
    results['std_error'] = std_bound(W2)
    results['cov_error'] = var_bound(W2, _compute_norm_if_needed(q_var),
                                     _compute_norm_if_needed(p_var))
    return results


def all_bounds(log_weights, samples=None, moment_bound_fn=None,
               q_var=None, p_var=None, log_norm_bound=None, alpha=2.0):
    """Compute all error and distance bounds.

    Orchestrates `divergence_bound` -> `wasserstein_bounds` -> `error_bounds`
    (reference: viabel/bounds.py:13-61).  Returns a dict with keys
    ``mean_error``, ``std_error``, ``cov_error``, ``W1``, ``W2``, ``d2``,
    ``log_norm_bound``.

    TPU note: when `samples` is given, the covariance (used for `q_var` if
    absent; reference: viabel/bounds.py:55-56) and the centered moments are
    produced by one fused device pass; the log-weight statistics by another.

    `alpha` must be 2: the Wasserstein formula ``2 C_2p^(1/2p)
    expm1(d)^(1/2p)`` and the downstream moment-error bounds are only valid
    for the 2-divergence (the reference hard-codes alpha=2 here for the
    same reason; use `divergence_bound` directly for other orders).
    """
    if alpha != 2:
        raise ValueError('all_bounds requires alpha == 2 (the Wasserstein '
                         'and moment-error bounds are 2-divergence bounds); '
                         'use divergence_bound for other orders')
    lw = jnp.asarray(log_weights)
    stats = log_weight_stats(lw, alpha=alpha)
    moments = None
    if samples is not None:
        # the covariance is only needed as the q_var fallback; when the
        # caller supplies q_var the (d, n) x (n, d) matmul would be dead
        moments = central_moments(jnp.asarray(samples),
                                  with_cov=q_var is None)
    d2, log_norm_bound = divergence_bound(
        lw, alpha=alpha, log_norm_bound=log_norm_bound,
        return_log_norm_bound=True, _stats=stats)
    results = wasserstein_bounds(d2, samples=None, moment_bound_fn=moment_bound_fn,
                                 _moments=moments)
    if q_var is None and moments is not None:
        q_var = np.asarray(moments['cov'])
        if q_var.shape == (1, 1):
            q_var = q_var[0, 0]
    if q_var is None:
        q_var = np.inf
    if p_var is None:
        p_var = np.inf
    results.update(error_bounds(q_var=q_var, p_var=p_var, **results))
    results['d2'] = d2
    results['log_norm_bound'] = log_norm_bound
    return results
