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


def auto_mesh(n_runs=1, n_samples=None, devices=None):
    """Best mesh placement for `n_runs` batched pipelines whose bound
    stages draw `n_samples` each, over the attached devices.

    The shared placement rule behind the CLI and the HTTP service
    (round-4 review: the two had diverged — the CLI ran K=4 starts on 8
    devices single-device while serve placed them on a (4, 2) mesh):

    * K > 1 runs: the run axis takes ``C = gcd(K, N)`` devices and the
      remaining ``S = N / C`` shard each run's bound pass — the 2-D
      layout of `validated_vi_multistart` / `validated_vi_sweep`;
    * K == 1: all devices go on the sample axis (`validated_vi(mesh=)`).

    Returns ``(mesh, note)``: `mesh` is None (single-device execution)
    when fewer than two devices are attached or the sizes do not divide,
    and `note` is a human-readable reason/description the caller MUST
    surface (never skip attached devices silently).
    """
    import math

    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_dev <= 1:
        return None, None
    if n_runs == 1:
        if n_samples is not None and n_samples % n_dev:
            return None, ('{} bound samples do not divide over the {} '
                          'attached devices; running single-device (pick '
                          'a multiple of {})'.format(n_samples, n_dev,
                                                     n_dev))
        return (make_mesh(axis_names=('sample',), shape=(n_dev,),
                          devices=devices),
                '{} devices on the sample axis'.format(n_dev))
    c = math.gcd(n_runs, n_dev)
    if c == 1:
        return None, ('{} runs share no common factor with the {} '
                      'attached devices; running single-device (pick a '
                      'run count with a common factor)'.format(n_runs,
                                                               n_dev))
    s = n_dev // c
    if s > 1 and n_samples is not None and n_samples % s:
        return None, ('{} bound samples do not divide over the sample '
                      'axis ({} devices); running single-device'.format(
                          n_samples, s))
    mesh = make_mesh(axis_names=('chain', 'sample'), shape=(c, s),
                     devices=devices)
    return mesh, ('({}x{}) (chain, sample) mesh: {} runs per device '
                  'group, bound passes {}-way sharded'.format(
                      c, s, n_runs // c, s) if s > 1
                  else '{} devices on the chain axis'.format(c))


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
