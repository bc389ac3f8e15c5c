"""Device-mesh construction helpers."""
import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'shard_over', 'fetch_global', 'auto_mesh']


def make_mesh(axis_names=('chain', 'sample'), shape=None, devices=None):
    """Build a Mesh over `devices`.

    With the default axes, chains (optimization replicas) shard over the
    first axis and Monte Carlo samples over the second.  `shape` defaults to
    putting all devices on the *sample* axis (the axis every workload uses),
    i.e. ``(1, n_devices)`` — pass an explicit shape for chain parallelism.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1,) * (len(axis_names) - 1) + (n,)
    if int(np.prod(shape)) != n:
        raise ValueError('mesh shape {} does not match {} devices'
                         .format(shape, n))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_over(x, mesh, axis_name, dim=0):
    """Place `x` on `mesh` sharded along `axis_name` at array dim `dim`."""
    spec = [None] * x.ndim
    spec[dim] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def _largest_divisor_leq(n, cap):
    """Largest d <= cap with n % d == 0 (>= 1; cap is a device count).

    Enumerates divisor pairs of `n` up to sqrt(n) instead of scanning
    linearly down from `cap`: `cap` is the attached device count, which on
    a pod slice reaches hundreds-to-thousands, and the downward scan was
    O(cap) Python work per `auto_mesh` call (round-5 advisor finding);
    this is O(sqrt(n)) with n a sample count (<= ~2000 steps at the 4e6
    service cap), independent of the device count.
    """
    best = 1
    d = 1
    while d * d <= n:
        if n % d == 0:
            if d <= cap and d > best:
                best = d
            pair = n // d
            if pair <= cap and pair > best:
                best = pair
        d += 1
    return best


def auto_mesh(n_runs=1, n_samples=None, devices=None):
    """Best mesh placement for `n_runs` batched pipelines whose bound
    stages draw `n_samples` each, over the attached devices.

    The shared placement rule behind the CLI and the HTTP service
    (round-4 review: the two had diverged — the CLI ran K=4 starts on 8
    devices single-device while serve placed them on a (4, 2) mesh):

    * K > 1 runs: the run axis takes ``C = gcd(K, N)`` devices (C may be
      1 — starts then stay vmapped while the bound passes still shard)
      and the remaining ``S = N / C`` shard each run's bound pass — the
      2-D layout of `validated_vi_multistart` / `validated_vi_sweep`;
    * K == 1: all devices go on the sample axis (`validated_vi(mesh=)`).

    When `n_samples` does not divide over the preferred sample axis, the
    axis DEGRADES to the largest divisor of `n_samples` that fits (using
    a subset of the devices) rather than abandoning the mesh — a user
    asking for 4 starts and 4001 bound samples on 8 devices still gets
    the (4, 1) chain placement (round-4 review finding).

    Returns ``(mesh, note)``: `mesh` is None (single-device execution)
    only when fewer than two devices are attached or no multi-device
    placement exists at all, and `note` is a human-readable
    reason/description the caller MUST surface (never skip or degrade
    attached devices silently).
    """
    import math

    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_dev <= 1:
        return None, None
    if n_runs == 1:
        s = n_dev
        if n_samples is not None and n_samples % s:
            s = _largest_divisor_leq(n_samples, n_dev)
            if s == 1:
                return None, ('{} bound samples share no factor <= {} '
                              'with the attached devices; running '
                              'single-device (pick a multiple of {})'
                              .format(n_samples, n_dev, n_dev))
            return (make_mesh(axis_names=('sample',), shape=(s,),
                              devices=devices[:s]),
                    '{} bound samples do not divide over all {} devices; '
                    'degraded to {} devices on the sample axis'.format(
                        n_samples, n_dev, s))
        return (make_mesh(axis_names=('sample',), shape=(s,),
                          devices=devices),
                '{} devices on the sample axis'.format(s))
    c = math.gcd(n_runs, n_dev)
    s = n_dev // c
    degraded = False
    if s > 1 and n_samples is not None and n_samples % s:
        s = _largest_divisor_leq(n_samples, s)
        degraded = True
    if c * s == 1:
        return None, ('{} runs share no common factor with the {} '
                      'attached devices and {} bound samples leave no '
                      'usable sample axis; running single-device'.format(
                          n_runs, n_dev, n_samples))
    mesh = make_mesh(axis_names=('chain', 'sample'), shape=(c, s),
                     devices=devices[:c * s])
    used = ('' if c * s == n_dev else
            ' (using {} of the {} attached devices{})'.format(
                c * s, n_dev,
                '; {} bound samples forced the degradation'.format(
                    n_samples) if degraded else ''))
    if s > 1:
        note = ('({}x{}) (chain, sample) mesh: {} runs per device '
                'group, bound passes {}-way sharded{}'.format(
                    c, s, n_runs // c, s, used))
    else:
        note = '{} devices on the chain axis{}'.format(c, used)
    return mesh, note


def fetch_global(x):
    """Fetch an array to host numpy, handling process-spanning shardings.

    ``np.asarray`` on a `jax.Array` works only when every shard is
    addressable by the calling process; under a multi-controller runtime
    (`initialize_distributed` — one process per host of a pod slice) the
    chain-sharded optimizer and pipeline outputs span processes, and
    fetching them naively raises.  This helper takes the replicated-gather
    path (`jax.experimental.multihost_utils.process_allgather`) exactly
    when needed — it is the multi-controller-safe `np.asarray` every host
    post-pass in this package uses.  Single-process arrays (and plain
    numpy inputs) pass straight through ``np.asarray``.
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)
