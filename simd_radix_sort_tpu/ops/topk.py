"""Top-k and unique: sort-adjacent query operators.

North-star operator-set extensions built on the same primitives as the sort
engine (SURVEY.md section 7 step 5).  Both are jittable and static-shape.

  * `top_k` — k extreme rows with payloads in lock-step.  Uses
    jax.lax.top_k on the order-transformed carrier, then moves payloads
    with a k-sized gather (k << n, so the gather is off the hot path —
    unlike full-permutation gathers, which measure ~70 Melem/s on TPU and
    are avoided everywhere else in this framework).
  * `unique` — distinct keys of a table: sort, neighbor-diff, stable
    compaction (ops/filter.compact), returning (count, keys_padded,
    first_payload_rows..., per_key_multiplicity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import transforms
from . import filter as filter_op
from . import xla_sort


# Block width for the two-level 64-bit selection: batched row sorts are the
# fastest reorder primitive on TPU (~4.5x a full lax.sort at large n,
# BENCH_NOTES.md), so top-k = per-block sort + keep-k columns + recombine.
_TOPK_BLOCK = 8192


def _top_k_idx_64(kops, k: int) -> jax.Array:
    """Indices of the k lexicographically-smallest (hi, lo, pos) rows,
    best-first, WITHOUT a full-length sort.

    Two-level selection (the VERDICT round-1 item): pad rows to blocks of
    _TOPK_BLOCK, sort each block independently (one batched lax.sort —
    VMEM-resident, measured far cheaper than a global sort), keep every
    block's first k columns, and recurse on the k*C survivors until one
    block remains.  The global top-k is always contained in the union of
    per-block top-k's, and (hi, lo, pos) is a total order, so the result
    is exact including position tie-breaks."""
    hi, lo = kops
    n = hi.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    if k * 2 >= min(n, _TOPK_BLOCK):
        # blocked selection cannot shrink the candidate set; one sort is
        # optimal at this k/n ratio
        out = jax.lax.sort((hi, lo, idx), num_keys=3, is_stable=True)
        return out[2][:k]
    # leading invalid flag keeps padding rows (flag 1) behind real rows
    streams = [jnp.zeros(n, jnp.uint8), hi, lo, idx]

    def block_round(streams, length):
        # b >= 2k so every round at least halves the candidate count
        b = min(_TOPK_BLOCK, max(2 * k, 128))
        c = -(-length // b)
        pad = c * b - length
        padded = [jnp.pad(s, (0, pad), constant_values=1 if i == 0 else 0)
                  for i, s in enumerate(streams)]
        mats = [s.reshape(c, b) for s in padded]
        out = jax.lax.sort(tuple(mats), dimension=1, num_keys=4,
                           is_stable=False)
        kk = min(k, b)
        return [m[:, :kk].reshape(-1) for m in out], c * kk

    length = n
    while length > max(k, _TOPK_BLOCK):
        streams, length = block_round(streams, length)
    final = jax.lax.sort(tuple(s[:length] for s in streams), num_keys=4,
                         is_stable=False)
    return final[3][:k]


def top_k(keys: jax.Array, *payloads, k: int, largest: bool = True,
          key_dtype=None):
    """k largest (or smallest) keys with lock-step payload rows.

    Returns (keys_k, payloads_k...).  Rows are ordered best-first.  Ties
    are broken by input position (lax.top_k is stable in that sense)."""
    if k > keys.shape[0]:
        raise ValueError(f"k={k} exceeds row count {keys.shape[0]}")
    kops = transforms.key_operands(keys, ascending=not largest,
                                   logical_dtype=key_dtype)
    if len(kops) == 2:
        # 64-bit keys: no u64 lanes on TPU (the X64 rewriter cannot lower
        # most u64 HLOs) — two-level blocked selection on (hi, lo, pos)
        idx = _top_k_idx_64(kops, k)
    else:
        (u,) = kops
        # the carrier is ascending for the requested order, so the k best
        # rows are the k largest of its complement
        _, idx = jax.lax.top_k(~u, k)
    keys_k = jnp.take(keys, idx)
    pays_k = tuple(jnp.take(p, idx) for p in payloads)
    return (keys_k,) + pays_k


def unique(keys: jax.Array, *payloads, key_dtype=None):
    """Distinct keys (sorted ascending) with each key's first payload row
    and multiplicity.

    Returns (count, keys_u, payloads_u..., counts_per_key): static-shape
    padded arrays with the `count` valid rows packed at the front (the XLA
    padded-result idiom, as in ops/filter)."""
    n = keys.shape[0]
    if n == 0:
        zero = jnp.zeros(0, jnp.int32)
        return (jnp.int32(0), keys) + tuple(payloads) + (zero,)
    ko, pos = xla_sort.sort_arrays(keys, (jnp.arange(n, dtype=jnp.int32),),
                                   ascending=True, stable=True,
                                   key_dtype=key_dtype)
    pos = pos[0]
    kops = transforms.key_operands(ko, True, key_dtype)
    # first-of-run mask: row 0, or any key word differs from predecessor
    first = jnp.ones(n, dtype=bool)
    if n > 1:
        same = jnp.ones(n - 1, dtype=bool)
        for w in kops:
            same = same & (w[1:] == w[:-1])
        first = jnp.concatenate([jnp.ones(1, dtype=bool), ~same])
    # run lengths via positions of firsts: for padded output compute
    # multiplicity = next_first_pos - first_pos
    idx = jnp.arange(n, dtype=jnp.int32)
    sorted_pays = tuple(jnp.take(p, pos) for p in payloads)
    count, ku, start_idx, *pu = filter_op.compact(first, ko, idx,
                                                  *sorted_pays)
    nxt = jnp.concatenate([start_idx[1:], jnp.full((1,), n, jnp.int32)])
    valid = jnp.arange(n, dtype=jnp.int32) < count - 1
    nxt = jnp.where(valid, nxt, n)
    mult = jnp.where(jnp.arange(n, dtype=jnp.int32) < count,
                     nxt - start_idx, 0)
    return (count, ku) + tuple(pu) + (mult.astype(jnp.int32),)
