"""In-repo MCMC ground truth: adaptive Hamiltonian Monte Carlo.

The reference anchors its benchmark posteriors on external Stan NUTS runs —
a long in-notebook fit for eight-schools (reference:
notebooks/eight-schools.ipynb cells 10-16) and a 10-chain x 50k NUTS run for
robust regression whose moments are only recorded as cell output (reference:
notebooks/robust-regression.ipynb cell 9).  This module replaces those
external anchors with a self-contained sampler so every ground-truth moment
in the repo is reproducible in-repo.

The sampler is fixed-length HMC with uniformly jittered trajectory lengths,
dual-averaging step-size adaptation (Hoffman & Gelman 2014, the scheme Stan
uses) and a pooled diagonal mass matrix estimated from warmup draws — not a
tree-building NUTS.  For the smooth, low-dimensional (d <= 30) posteriors
used as ground truth here this matches NUTS-quality moments; the
funnel-shaped eight-schools CP geometry is handled the way the reference
itself does: sample the non-centered parameterization and transform
(reference: notebooks/eight-schools.ipynb cell 14).

Everything is jit-compiled `lax.scan` phases with chains vmapped — one
compiled program per phase, no per-iteration host dispatch.
"""
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['hmc_sample', 'hmc_ground_truth']


@lru_cache(maxsize=256)
def _scalar_log_prob(log_prob):
    """Cached scalar-output wrapper: `_hmc_phase` treats the log density as
    a static jit argument, so the wrapper must be one object per underlying
    `log_prob` or every `hmc_sample` call recompiles all three phases
    (CLAUDE.md convention; see optimizers._pad_objective)."""
    return lambda q: jnp.reshape(log_prob(q), ())


def _leapfrog(grad_fn, q, p, eps, inv_mass, n_steps):
    """`n_steps` leapfrog updates of (q, p) under diagonal mass.

    The gradient is carried between steps: step k's closing half-kick and
    step k+1's opening half-kick both use grad(q_{k+1}), so carrying it
    halves the gradient count (n_steps + 1 evaluations instead of
    2 * n_steps) with bit-identical trajectories — the gradient is the
    dominant cost of every HMC run."""
    def body(_, qpg):
        q, p, g = qpg
        p_half = p + 0.5 * eps * g
        q = q + eps * inv_mass * p_half
        g = grad_fn(q)
        p = p_half + 0.5 * eps * g
        return q, p, g

    q, p, _ = jax.lax.fori_loop(0, n_steps, body, (q, p, grad_fn(q)))
    return q, p


def _hmc_transition(log_prob_fn, grad_fn, q, key, eps, inv_mass, max_steps):
    """One jittered-length HMC proposal + Metropolis accept.

    Trajectory length is drawn uniformly from {1, ..., max_steps} to break
    the resonances a fixed length can lock into.
    Returns (q_new, accept_prob, accepted).
    """
    k_mom, k_len, k_acc = jax.random.split(key, 3)
    sd = jnp.sqrt(1.0 / inv_mass)
    p = sd * jax.random.normal(k_mom, q.shape, dtype=q.dtype)
    n_steps = jax.random.randint(k_len, (), 1, max_steps + 1)

    h0 = -log_prob_fn(q) + 0.5 * jnp.sum(inv_mass * p * p)
    q_new, p_new = _leapfrog(grad_fn, q, p, eps, inv_mass, n_steps)
    h1 = -log_prob_fn(q_new) + 0.5 * jnp.sum(inv_mass * p_new * p_new)

    log_accept = jnp.minimum(0.0, h0 - h1)
    log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
    accept = jnp.log(jax.random.uniform(k_acc, (), dtype=q.dtype)) \
        < log_accept
    q_out = jnp.where(accept, q_new, q)
    return q_out, jnp.exp(log_accept), accept


class _DAState:
    """Dual-averaging hyperparameters (Hoffman & Gelman 2014, Alg. 5 /
    Stan defaults): gamma=0.05, t0=10, kappa=0.75."""
    gamma, t0, kappa = 0.05, 10.0, 0.75


@partial(jax.jit, static_argnames=('log_prob_fn', 'n_iters', 'max_steps',
                                   'adapt'))
def _hmc_phase(log_prob_fn, n_iters, max_steps, adapt, target_accept,
               q0, keys, eps0, inv_mass):
    """One compiled HMC phase over vmapped chains.

    With ``adapt=True``, runs dual averaging on log step size toward
    `target_accept` and returns the averaged (smoothed) step size; with
    ``adapt=False``, samples at fixed `eps0`.  Returns
    ``(positions (chains, n_iters, D), final q, adapted eps,
    mean accept prob)``.
    """
    grad_fn = jax.grad(log_prob_fn)

    def one_chain(q0, chain_key, eps0):
        mu = jnp.log(10.0) + jnp.log(eps0)
        da0 = (jnp.log(eps0), 0.0, jnp.log(eps0))  # log_eps, h_bar, log_eps_bar

        def step(carry, i):
            q, da = carry
            log_eps, h_bar, log_eps_bar = da
            key = jax.random.fold_in(chain_key, i)
            q, accept_prob, _ = _hmc_transition(
                log_prob_fn, grad_fn, q, key, jnp.exp(log_eps), inv_mass,
                max_steps)
            if adapt:
                t = i.astype(q.dtype) + 1.0
                w = 1.0 / (t + _DAState.t0)
                h_bar = (1.0 - w) * h_bar + w * (target_accept - accept_prob)
                log_eps = mu - jnp.sqrt(t) / _DAState.gamma * h_bar
                w2 = t ** (-_DAState.kappa)
                log_eps_bar = w2 * log_eps + (1.0 - w2) * log_eps_bar
            return (q, (log_eps, h_bar, log_eps_bar)), (q, accept_prob)

        (q, da), (qs, accepts) = jax.lax.scan(
            step, (q0, da0), jnp.arange(n_iters))
        eps_out = jnp.exp(da[2]) if adapt else eps0
        return qs, q, eps_out, jnp.mean(accepts)

    return jax.vmap(one_chain)(q0, keys, eps0)


def hmc_sample(log_prob, init, key=None, n_samples=5000, n_warmup=1000,
               n_chains=4, max_steps=32, target_accept=0.8,
               init_jitter=1.0, eps0=0.1, mesh=None):
    """Adaptive-HMC posterior draws.

    Parameters
    ----------
    log_prob : callable
        Log density; must accept a 1-D ``(d,)`` point (the `Model.log_prob`
        convention works directly).
    init : (d,) array
        Center of the overdispersed chain initialization
        ``init + N(0, init_jitter^2)``.
    n_samples, n_warmup, n_chains, max_steps, target_accept, eps0 :
        Sampler configuration.  Warmup runs in two halves: step-size dual
        averaging under a unit mass, then mass estimation (pooled across
        chains from the first half's second-half draws) and re-adaptation.
    mesh : optional jax.sharding.Mesh
        Place the chain axis on the mesh's ``chain`` axis — N chains on N
        devices run in one chain's wall-clock, the same GSPMD placement
        the IA optimizers use (`parallel.shard_chain_inputs`).  ``chain``
        must divide `n_chains`.  Unlike the smooth optimizers, sharded
        runs are NOT bit-identical to unsharded ones: partitioning changes
        XLA's batching/fusion by an ulp, and the Metropolis accept/reject
        amplifies any ulp into a different chain path.  Each layout is
        individually deterministic (same mesh -> same draws), both target
        the same stationary distribution, and the R-hat gate in
        `hmc_ground_truth` applies either way.

    Returns
    -------
    dict with ``samples`` (n_chains, n_samples, d), ``mean``, ``cov``
    (pooled over chains), ``r_hat`` (split R-hat per dim), ``accept_rate``,
    ``step_size``, ``inv_mass``.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    init = jnp.asarray(init, dtype=jnp.result_type(float))
    d = init.shape[0]
    try:
        lp1 = _scalar_log_prob(log_prob)
    except TypeError:  # unhashable callable
        lp1 = lambda q: jnp.reshape(log_prob(q), ())

    if mesh is not None:
        if 'chain' not in mesh.axis_names:
            raise ValueError(
                "hmc_sample partitions chains over a mesh axis named "
                "'chain'; the given mesh has axes {} (build it with "
                "make_mesh(axis_names=('chain',), ...))".format(
                    mesh.axis_names))
        if n_chains % mesh.shape['chain']:
            raise ValueError('the mesh chain axis size ({}) must divide '
                             'n_chains ({})'.format(mesh.shape['chain'],
                                                    n_chains))

    def place(q, keys, eps):
        """Chain-axis placement (no-op without a mesh): re-applied per
        phase because fresh per-phase keys arrive unplaced."""
        if mesh is None:
            return q, keys, eps
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .parallel.sharded_chains import shard_chain_inputs
        q, keys = shard_chain_inputs(q, keys, mesh)
        return q, keys, jax.device_put(eps, NamedSharding(mesh, P('chain')))

    k_init, k_w1, k_w2, k_samp = jax.random.split(key, 4)
    q0 = init[None, :] + init_jitter * jax.random.normal(
        k_init, (n_chains, d), dtype=init.dtype)
    eps_init = jnp.full((n_chains,), eps0, dtype=init.dtype)
    unit_mass = jnp.ones((d,), dtype=init.dtype)

    # warmup I: adapt step size under unit mass
    n_w1 = max(n_warmup // 2, 20)
    q0, chain_keys, eps_init = place(q0, jax.random.split(k_w1, n_chains),
                                     eps_init)
    qs, q1, eps1, _ = _hmc_phase(lp1, n_w1, max_steps, True, target_accept,
                                 q0, chain_keys, eps_init, unit_mass)
    # pooled diagonal preconditioner from the second half of warmup-I
    # draws: the INVERSE mass is set to the estimated posterior variance
    # (M = Sigma^-1, the standard Stan/euclidean metric), so wide
    # dimensions get proportionally larger position updates
    inv_mass = jnp.maximum(
        jnp.var(qs[:, n_w1 // 2:].reshape(-1, d), axis=0), 1e-8)

    # warmup II: re-adapt step size under the estimated mass
    n_w2 = max(n_warmup - n_w1, 20)
    q1, chain_keys, eps1 = place(q1, jax.random.split(k_w2, n_chains), eps1)
    _, q2, eps2, _ = _hmc_phase(lp1, n_w2, max_steps, True, target_accept,
                                q1, chain_keys, eps1, inv_mass)

    # sampling at fixed step size
    q2, chain_keys, eps2 = place(q2, jax.random.split(k_samp, n_chains),
                                 eps2)
    samples, _, _, accept = _hmc_phase(lp1, n_samples, max_steps, False,
                                       target_accept, q2, chain_keys, eps2,
                                       inv_mass)

    from .parallel import fetch_global
    samples = fetch_global(samples)  # multi-controller-safe host fetch
    flat = samples.reshape(-1, d)
    from .diagnostics import compute_R_hat
    _, r_hat = compute_R_hat(samples, warmup=0)
    return dict(samples=samples,
                mean=flat.mean(axis=0),
                cov=np.cov(flat.T),
                r_hat=np.asarray(r_hat),
                # np.mean on the already-gathered host array: a jnp.mean
                # would re-upload it and pay a second dispatch round trip
                accept_rate=float(np.mean(fetch_global(accept))),
                step_size=fetch_global(eps2),
                # inv_mass is reduced from the chain-sharded warmup draws,
                # so under a process-spanning mesh it is itself a global
                # array: bare np.asarray would raise on non-addressable
                # shards (CLAUDE.md fetch convention)
                inv_mass=fetch_global(inv_mass))


def hmc_ground_truth(model, key=None, transform=None, r_hat_tol=1.01,
                     **kwargs):
    """Posterior mean/cov for a `Model` via `hmc_sample`, with an R-hat
    convergence gate.

    `transform` optionally maps draws to a reporting scale before moments
    are taken (e.g. `models.eight_schools_ncp_to_cp`, mirroring how the
    reference derives CP ground truth from NCP draws; reference:
    notebooks/eight-schools.ipynb cell 14).  Raises RuntimeError if any
    split R-hat exceeds `r_hat_tol`.
    """
    out = hmc_sample(model.log_prob, np.zeros(model.dim), key=key, **kwargs)
    bad = np.max(out['r_hat'])
    if bad > r_hat_tol:
        raise RuntimeError(
            'HMC not converged: max split R-hat {:.4f} > {}'.format(
                bad, r_hat_tol))
    samples = out['samples'].reshape(-1, model.dim)
    if transform is not None:
        samples = np.asarray(transform(samples))
    return dict(mean=samples.mean(axis=0), cov=np.cov(samples.T),
                diagnostics=out)
