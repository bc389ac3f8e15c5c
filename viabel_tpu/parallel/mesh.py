"""Device-mesh construction helpers."""
import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'shard_over', 'fetch_global']


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
