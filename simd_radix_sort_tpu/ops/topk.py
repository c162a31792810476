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
        # most u64 HLOs) — select the k best rows with a 2-word
        # lexicographic sort instead of lax.top_k on a merged carrier
        n = keys.shape[0]
        _, _, idx = jax.lax.sort(
            kops + (jnp.arange(n, dtype=jnp.int32),), num_keys=2,
            is_stable=True)
        idx = idx[:k]
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
