"""Chain (optimization-replica) parallelism over the mesh.

The reference runs its `n_optimisers` multi-start chains sequentially in a
Python loop (reference: viabel/vb.py:417, 582).  `viabel_tpu.optimizers`
already vmaps the chains into one program; placing the chain-axis inputs on
the mesh's ``chain`` axis makes GSPMD partition every per-chain `lax.scan`
across devices — N chains on N devices run in the wall-clock time of one.
"""
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ['shard_chain_inputs']


def shard_chain_inputs(inits, keys, mesh, axis='chain'):
    """Place per-chain inits (n_chains, P) and keys on the mesh, sharded
    along the chain axis.  Pass the results to any `*_IA_optimize*`
    optimizer (they vmap over the leading axis) to parallelize chains over
    devices.

    `keys` may be raw uint32 keys (n_chains, 2) or new-style typed PRNG
    keys (n_chains,) — the sharding spec is rank-dependent, like the
    batched pipelines' key handling."""
    keys_spec = P(*([axis] + [None] * (keys.ndim - 1)))
    return (jax.device_put(inits, NamedSharding(mesh, P(axis, None))),
            jax.device_put(keys, NamedSharding(mesh, keys_spec)))
