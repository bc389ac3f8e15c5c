"""Multi-host initialization.

On a TPU pod slice, call `initialize_distributed()` once per host before
any JAX operation; the mesh builders in `viabel_tpu.parallel.mesh` then see
every chip in the slice via `jax.devices()`, and the shard_map estimators
run unchanged with intra-slice reductions over ICI and cross-slice over DCN
(SURVEY.md section 5 "Distributed communication backend").

This module is a thin, documented wrapper because JAX's collectives need no
hand-written communication layer — the work is in the sharding annotations,
which `viabel_tpu.parallel` already provides.  The cross-process path is
exercised for real by `tests/test_distributed.py`: two OS processes form a
global mesh and the sharded estimators reproduce single-process numbers
exactly.
"""
import jax

__all__ = ['initialize_distributed', 'local_device_count', 'process_info']


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Initialize `jax.distributed` for a multi-host run.

    With no arguments, relies on the TPU environment's automatic discovery
    (the normal case on Cloud TPU pods); arguments are forwarded for manual
    setups.  Safe to call once per process, before any backend use.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    jax.distributed.initialize(**kwargs)
    return process_info()


def local_device_count():
    return jax.local_device_count()


def process_info():
    """(process_index, process_count, global_devices, local_devices)."""
    return dict(process_index=jax.process_index(),
                process_count=jax.process_count(),
                global_devices=len(jax.devices()),
                local_devices=jax.local_device_count())
