"""Vectorized rank sort for small blocks — the TPU sorting network.

TPU-native replacement for the reference's small-array comparison sorters
(/root/reference/src/cmp_sorters.hpp:18-63: multi-stream insertion sort and
the Bramas AVX-512 sorting networks).  Sorting networks map poorly to TPU
(lane shuffles are expensive); the idiomatic equivalent is an O(n^2) rank
sort that is 100% dense vector/matrix work:

  rank[i] = #{ j : key[j] < key[i]  or  (key[j] == key[i] and j < i) }

computed as an (n, n) comparison matrix reduced along one axis (VPU).  The
rank permutation is inverted scatter-free with an exact one-hot matmul on
the MXU (iota row-vector times the one-hot destination matrix, exact in f32
for n <= 2^24), and the data streams then move with one take per stream.
Ties broken by input index make the sort STABLE.

This is both the base-case sorter for radix partition tails and a standalone
method for small n (methods.REGISTRY["rank"]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import transforms

# Above this the (n, n) comparison matrix stops fitting comfortably; larger
# arrays belong to the radix/xla methods.
MAX_RANK_SORT_N = 4096


def _ranks(kops) -> jax.Array:
    """Stable rank of every element from its key operands (1 or 2 words)."""
    n = kops[0].shape[0]
    if len(kops) == 1:
        a = kops[0]
        lt = a[None, :] < a[:, None]   # lt[i, j] = key_j < key_i
        eq = a[None, :] == a[:, None]
    else:
        hi, lo = kops
        hi_lt = hi[None, :] < hi[:, None]
        hi_eq = hi[None, :] == hi[:, None]
        lo_lt = lo[None, :] < lo[:, None]
        lo_eq = lo[None, :] == lo[:, None]
        lt = hi_lt | (hi_eq & lo_lt)
        eq = hi_eq & lo_eq
    idx = jnp.arange(n, dtype=jnp.int32)
    before = idx[None, :] < idx[:, None]  # j < i
    c = lt | (eq & before)
    return jnp.sum(c, axis=1, dtype=jnp.int32)


def inverse_perm_matmul(rank: jax.Array) -> jax.Array:
    """Invert the rank permutation scatter-free: src[k] = i where rank[i]==k.

    One-hot(rank) is exact 0/1 in f32 and indices < 2^24 are exact in f32, so
    a single (n, n) x (n, 1) matmul on the MXU computes the inverse
    permutation with no scatter and no lane shuffles."""
    n = rank.shape[0]
    onehot = (rank[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)  # onehot[i, k]: element i -> slot k
    idx = jnp.arange(n, dtype=jnp.int32).astype(jnp.float32)[:, None]
    src = jax.lax.dot_general(
        onehot, idx, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # src[k] = sum_i onehot[i,k] * i
    return src[:, 0].astype(jnp.int32)


def sort_arrays(keys: jax.Array, payloads, ascending: bool = True,
                key_dtype=None):
    """Stable rank sort of a small array with lock-step payloads."""
    n = keys.shape[0]
    if n > MAX_RANK_SORT_N:
        raise ValueError(f"rank sort limited to n<={MAX_RANK_SORT_N}, got {n}")
    if n == 0:
        return keys, tuple(payloads)
    kops = transforms.key_operands(keys, ascending, key_dtype)
    rank = _ranks(kops)
    src = inverse_perm_matmul(rank)
    out = tuple(jnp.take(s, src, axis=0) for s in (keys,) + tuple(payloads))
    # With key_dtype set, keys arrived (and leave) as raw bits in the
    # unsigned carrier; the host boundary in ops/sort.py reinterprets them.
    return out[0], tuple(out[1:])
