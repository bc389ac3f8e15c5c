"""Fused Monte Carlo sample-and-score Pallas kernels.

These accelerate the reference's bound-estimation hot loop
(reference: notebooks/experiments.py:159-166 draws n ~ 1e6 samples, scores
them with `logdensity` and the family `logdensity`, then reduces CUBO/ELBO
statistics in several numpy passes; SURVEY.md section 3.1 "HOT LOOP 2").

Design (see /opt/skills/guides/pallas_guide.md):

* samples are laid out ``(dim_padded, TILE)`` — parameter dimensions on
  sublanes (padded to 8 for f32), Monte Carlo samples on lanes — so the
  tiny `dim` never fights the 128-lane tiling;
* standard normals come from the TPU-native PRNG (`pltpu.prng_random_bits`
  + Box-Muller), seeded per grid step, instead of XLA's threefry;
* the kernels are a pure *map*: every grid step writes per-tile partial
  statistics (tile max, tile-max-rescaled exponential sums, raw moments)
  to its own output block, and a tiny XLA epilogue combines the tiles with
  the running-max rescaling identity.  No loop-carried scratch state —
  each step is independent, which both pipelines cleanly and sidesteps
  Mosaic's serialization of revisited blocks;
* the log-weights are also written out (n floats — `dim`-times smaller than
  the samples the reference materializes) for PSIS consumption.

Kernels are f32 and TPU-only; callers fall back to the XLA path elsewhere.
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['streaming_lw_stats', 'fused_gaussian_lw_stats',
           'fused_location_scale_lw_stats']

_LOG_2PI = math.log(2.0 * math.pi)
_NEG_BIG = -3.0e38  # effectively -inf for f32 max-padding


def _on_tpu():
    return jax.devices()[0].platform in ('tpu', 'axon')


def _tile_stats_rows(lw, valid, alpha):
    """Per-tile partial statistics, broadcast into an (8, 128) block:
    row 0 = tile max, 1 = sum exp(a(lw-max)), 2 = sum exp(2a(lw-max)),
    3 = sum lw, 4 = sum lw^2 (valid elements only)."""
    lw_m = jnp.where(valid, lw, _NEG_BIG)
    lw_z = jnp.where(valid, lw, 0.0)
    m = jnp.max(lw_m)
    e = jnp.where(valid, jnp.exp(alpha * (lw_m - m)), 0.0)
    s1 = jnp.sum(e)
    s2 = jnp.sum(e * e)
    slw = jnp.sum(lw_z)
    slw2 = jnp.sum(lw_z * lw_z)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    out = jnp.where(row == 0, m, 0.0)
    out = jnp.where(row == 1, s1, out)
    out = jnp.where(row == 2, s2, out)
    out = jnp.where(row == 3, slw, out)
    return jnp.where(row == 4, slw2, out)


@functools.partial(jax.jit, static_argnames=('alpha', 'n'))
def _combine_tiles(tiles, alpha, n):
    """Combine per-tile partial stats (T, 8, 128) -> global stats dict via
    the running-max rescaling identity (tiny XLA epilogue)."""
    m_t = tiles[:, 0, 0]
    s1_t = tiles[:, 1, 0]
    s2_t = tiles[:, 2, 0]
    slw = jnp.sum(tiles[:, 3, 0])
    slw2 = jnp.sum(tiles[:, 4, 0])
    M = jnp.max(m_t)
    r = jnp.exp(alpha * (m_t - M))
    s1 = jnp.sum(s1_t * r)
    s2 = jnp.sum(s2_t * r * r)
    nf = jnp.float32(n)
    mean_w = s1 / nf
    mean_lw = slw / nf
    return dict(
        log_rescale=M,
        mean_rescaled_alpha=mean_w,
        std_rescaled_alpha=jnp.sqrt(jnp.maximum(s2 / nf - mean_w ** 2, 0.0)),
        mean_lw=mean_lw,
        std_lw=jnp.sqrt(jnp.maximum(slw2 / nf - mean_lw ** 2, 0.0)),
    )


# ---------------------------------------------------------------------------
# streaming one-pass log-weight statistics
# ---------------------------------------------------------------------------

_BLOCK_R = 256          # rows of 128 lanes per grid step (32768 elements)


def _stats_kernel(alpha, n, lw_ref, out_ref):
    step = pl.program_id(0)
    base = step * _BLOCK_R * 128
    idx = base + (jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_R, 128), 0)
                  * 128
                  + jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_R, 128), 1))
    out_ref[:] = _tile_stats_rows(lw_ref[:], idx < n, alpha)


@functools.partial(jax.jit, static_argnames=('alpha', 'interpret'))
def _streaming_lw_stats_tpu(lw, alpha, interpret=False):
    n = lw.shape[0]
    chunk = _BLOCK_R * 128
    n_pad = -(-n // chunk) * chunk
    lw_pad = jnp.pad(lw.astype(jnp.float32), (0, n_pad - n),
                     constant_values=_NEG_BIG).reshape(-1, 128)
    grid = n_pad // chunk
    tiles = pl.pallas_call(
        functools.partial(_stats_kernel, float(alpha), n),
        out_shape=jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((_BLOCK_R, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lw_pad)
    return _combine_tiles(tiles.reshape(grid, 8, 128), alpha, n)


def streaming_lw_stats(log_weights, alpha=2.0, interpret=False):
    """One-pass `log_weight_stats` (max + rescaled exponential moments +
    raw moments) as a Pallas map + tiny XLA combine; XLA fallback off-TPU.

    Drop-in for `viabel_tpu.bounds.log_weight_stats` on f32 inputs.
    `interpret=True` runs the kernel in the Pallas interpreter (for CPU
    testing).
    """
    lw = jnp.ravel(jnp.asarray(log_weights))
    if (not _on_tpu() and not interpret) or lw.dtype != jnp.float32:
        from ..bounds import log_weight_stats
        return log_weight_stats(lw, alpha=alpha)
    stats = _streaming_lw_stats_tpu(lw, alpha, interpret)
    stats['n'] = lw.shape[0]
    return stats


# ---------------------------------------------------------------------------
# fused Gaussian sample -> score -> reduce
# ---------------------------------------------------------------------------

_TILE_N = 2048          # MC samples per grid step (lanes-major)


def _uniform_from_bits(shape):
    """U(0,1) floats in (2^-24, 1] from the TPU PRNG (24 mantissa bits).

    The raw bits are int32; bitcast to uint32 before shifting so the shift
    is logical — an arithmetic shift on negative bits would yield u > 1 and
    NaN normals downstream.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return 1.0 - u  # (0, 1], safe for log


def _box_muller(shape):
    u1 = _uniform_from_bits(shape)
    u2 = _uniform_from_bits(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * jnp.pi * u2)


def _as_row_model(model_fn_rows):
    """Normalize a plain row callable or RowModel to (fn, args)."""
    from .row_models import RowModel
    if isinstance(model_fn_rows, RowModel):
        return model_fn_rows
    return RowModel(model_fn_rows, ())


def _model_arg_specs(args):
    """Full-block constant-index VMEM specs for model data arrays."""
    specs = []
    arrays = []
    for a in args:
        a = jnp.asarray(a, jnp.float32)
        if a.ndim != 2:
            raise ValueError('model args must be 2-D arrays')
        specs.append(pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
        arrays.append(a)
    return specs, arrays


def _fused_kernel(model_fn, n_args, dim, dim_pad, n, alpha, seed, *refs):
    mean_ref, log_std_ref = refs[0], refs[1]
    arg_refs = refs[2:2 + n_args]
    lw_out_ref, stats_ref = refs[2 + n_args], refs[3 + n_args]
    step = pl.program_id(0)
    pltpu.prng_seed(seed + step)

    z = _box_muller((dim_pad, _TILE_N))
    mean = mean_ref[:]          # (dim_pad, 1)
    log_std = log_std_ref[:]    # (dim_pad, 1)
    x = mean + jnp.exp(log_std) * z

    # closed-form diagonal-Gaussian log q over the real dims only
    row = jax.lax.broadcasted_iota(jnp.int32, (dim_pad, _TILE_N), 0)
    real = row < dim
    z2 = jnp.where(real, z * z + _LOG_2PI, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (dim_pad, 1), 0)
    sum_log_std = jnp.sum(jnp.where(col < dim, log_std, 0.0))
    logq = -0.5 * jnp.sum(z2, axis=0) - sum_log_std     # (TILE,)

    logp = model_fn(x, *[r[:] for r in arg_refs])        # (TILE,)
    lw = (logp - logq).reshape(1, _TILE_N)

    base = step * _TILE_N
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (1, _TILE_N), 1)
    valid = idx < n
    lw_out_ref[:] = jnp.where(valid, lw, _NEG_BIG)
    stats_ref[:] = _tile_stats_rows(lw, valid, alpha)


def fused_gaussian_lw_stats(model_fn_rows, mean, log_std, n_samples, seed,
                            alpha=2.0, interpret=False):
    """Fused mean-field-Gaussian bound-estimation pass.

    Generates `n_samples` draws of ``q = N(mean, diag(exp(log_std))^2)``
    with the in-kernel TPU PRNG, scores ``lw = log p - log q``, and emits
    per-tile CUBO/ELBO statistics — one kernel, one pass, no sample
    materialization.

    Parameters
    ----------
    model_fn_rows : callable
        ``(dim_padded, TILE) f32 -> (TILE,) f32`` log density, reading the
        parameter dims from the leading (sublane) axis; rows >= dim are
        zero-padding.  Any jnp-traceable code works (see
        `viabel_tpu.ops.row_models`).
    mean, log_std : (dim,) f32 arrays
    n_samples : int
    seed : int32 PRNG seed
    alpha : float

    Returns
    -------
    (log_weights (n_samples,), stats dict as `log_weight_stats`)
    """
    model = _as_row_model(model_fn_rows)
    arg_specs, arg_arrays = _model_arg_specs(model.args)
    mean = jnp.asarray(mean, jnp.float32)
    log_std = jnp.asarray(log_std, jnp.float32)
    dim = mean.shape[0]
    dim_pad = max(8, -(-dim // 8) * 8)
    n_pad = -(-n_samples // _TILE_N) * _TILE_N
    grid = n_pad // _TILE_N

    mean_col = jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(mean)
    ls_col = jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(log_std)

    lw_pad, tiles = pl.pallas_call(
        functools.partial(_fused_kernel, model.fn, len(arg_arrays), dim,
                          dim_pad, n_samples, float(alpha), seed),
        out_shape=(jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32)),
        grid=(grid,),
        in_specs=[pl.BlockSpec((dim_pad, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((dim_pad, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] + arg_specs,
        out_specs=(pl.BlockSpec((1, _TILE_N), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(mean_col, ls_col, *arg_arrays)
    lw = lw_pad[0, :n_samples]
    stats = _combine_tiles(tiles.reshape(grid, 8, 128), alpha, n_samples)
    stats['n'] = n_samples
    return lw, stats


# ---------------------------------------------------------------------------
# fused transform -> score -> reduce from external standard draws
# ---------------------------------------------------------------------------

def _ls_kernel(model_fn, base_lp_fn, n_args, dim, dim_pad, n, alpha, *refs):
    z_ref, mean_ref, log_scale_ref = refs[0], refs[1], refs[2]
    arg_refs = refs[3:3 + n_args]
    lw_out_ref, stats_ref = refs[3 + n_args], refs[4 + n_args]
    step = pl.program_id(0)
    z = z_ref[:]                # (dim_pad, TILE) standard draws
    mean = mean_ref[:]          # (dim_pad, 1)
    log_scale = log_scale_ref[:]
    x = mean + jnp.exp(log_scale) * z

    col = jax.lax.broadcasted_iota(jnp.int32, (dim_pad, 1), 0)
    sum_log_scale = jnp.sum(jnp.where(col < dim, log_scale, 0.0))
    logq = base_lp_fn(z) - sum_log_scale          # (TILE,)
    logp = model_fn(x, *[r[:] for r in arg_refs])
    lw = (logp - logq).reshape(1, _TILE_N)

    base = step * _TILE_N
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (1, _TILE_N), 1)
    valid = idx < n
    lw_out_ref[:] = jnp.where(valid, lw, _NEG_BIG)
    stats_ref[:] = _tile_stats_rows(lw, valid, alpha)


def normal_base_logpdf_rows(dim):
    """Row-layout standard-normal log density (for Gaussian families)."""
    def fn(z):
        row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
        t = jnp.where(row < dim, z * z + _LOG_2PI, 0.0)
        return -0.5 * jnp.sum(t, axis=0)
    return fn


def student_t_base_logpdf_rows(dim, df):
    """Row-layout standard Student-t log density (for mean-field t)."""
    from jax.scipy.special import gammaln
    lognorm = float(gammaln(0.5 * (df + 1.0)) - gammaln(0.5 * df)
                    - 0.5 * np.log(df * np.pi))

    def fn(z):
        row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
        t = jnp.where(row < dim,
                      lognorm - 0.5 * (df + 1.0) * jnp.log1p(z * z / df),
                      0.0)
        return jnp.sum(t, axis=0)
    return fn


def fused_location_scale_lw_stats(model_fn_rows, base_logpdf_rows, z,
                                  mean, log_scale, alpha=2.0,
                                  interpret=False):
    """Fused transform -> score -> reduce for location-scale families.

    Like `fused_gaussian_lw_stats` but consuming externally generated
    standard draws `z` (n, dim) — e.g. `jax.random.normal` or
    `jax.random.t` output — so it covers Student-t families and runs on
    backends whose Pallas lowering lacks the TPU PRNG (including this
    development environment's remote-compile tunnel and the CPU
    interpreter).  One pass: samples are transformed, scored against the
    model and the closed-form log q, and reduced to per-tile CUBO/ELBO
    statistics without materializing the transformed samples.

    Returns ``(log_weights (n,), stats dict as log_weight_stats)``.
    """
    model = _as_row_model(model_fn_rows)
    arg_specs, arg_arrays = _model_arg_specs(model.args)
    mean = jnp.asarray(mean, jnp.float32)
    log_scale = jnp.asarray(log_scale, jnp.float32)
    z = jnp.asarray(z, jnp.float32)
    n, dim = z.shape
    dim_pad = max(8, -(-dim // 8) * 8)
    n_pad = -(-n // _TILE_N) * _TILE_N
    grid = n_pad // _TILE_N

    z_rows = jnp.zeros((dim_pad, n_pad), jnp.float32)
    z_rows = z_rows.at[:dim, :n].set(z.T)
    mean_col = jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(mean)
    ls_col = jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(log_scale)

    lw_pad, tiles = pl.pallas_call(
        functools.partial(_ls_kernel, model.fn, base_logpdf_rows,
                          len(arg_arrays), dim, dim_pad, n, float(alpha)),
        out_shape=(jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32)),
        grid=(grid,),
        in_specs=[pl.BlockSpec((dim_pad, _TILE_N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((dim_pad, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((dim_pad, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] + arg_specs,
        out_specs=(pl.BlockSpec((1, _TILE_N), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(z_rows, mean_col, ls_col, *arg_arrays)
    lw = lw_pad[0, :n]
    stats = _combine_tiles(tiles.reshape(grid, 8, 128), alpha, n)
    stats['n'] = n
    return lw, stats
