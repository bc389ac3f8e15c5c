"""PRNG-key plumbing helpers.

The reference threads integer seeds through a global
`numpy.random.RandomState` (reference: viabel/vb.py:49,55,258).  The TPU-native
design threads explicit `jax.random` keys instead; these helpers keep that
plumbing terse.  Because JAX's VJP replays the primal's sample values by
construction, CHIVI's seed-replay mechanism (reference: viabel/vb.py:258-263)
is unnecessary here.
"""
import jax

__all__ = ['split_like', 'fold_in_index']


def split_like(key, n):
    """Split `key` into `n` independent keys (shape (n, ...))."""
    return jax.random.split(key, n)


def fold_in_index(key, i):
    """Derive a per-iteration key deterministically from a base key."""
    return jax.random.fold_in(key, i)
