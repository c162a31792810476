"""Filter: predicate mask + stable compaction.

North-star operator (BASELINE.json: "filter (mask+compaction = same scatter
kernel)").  The reference's machinery for this is the masked compress-store
(mask_compressstoreu, /root/reference/src/simd.hpp:310-389); the TPU-native
equivalent keeps static shapes: compaction returns full-size arrays with the
selected rows packed stably at the front plus a count — the standard XLA
padded-result idiom.

Implementation: a stable variadic sort on the inverted mask — one fused XLA
sort moves every stream in lock-step, exactly like the key/payload
compress-store keeps streams aligned.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compact(mask: jax.Array, *streams, fill=None):
    """Stably pack rows where mask is True to the front of every stream.

    Returns (count, packed_streams...).  Rows past `count` hold the non-
    selected rows (stably) unless `fill` is given, in which case they are
    overwritten with that scalar.
    """
    if mask.ndim != 1:
        raise ValueError("mask must be 1-D")
    n = mask.shape[0]
    inv = (~mask).astype(jnp.uint8)
    out = jax.lax.sort((inv,) + tuple(streams), num_keys=1, is_stable=True)
    count = jnp.sum(mask, dtype=jnp.int32)
    packed = out[1:]
    if fill is not None:
        sel = jnp.arange(n, dtype=jnp.int32) < count
        packed = tuple(jnp.where(sel, s, s.dtype.type(fill)) for s in packed)
    return (count,) + tuple(packed)


# Block width for the bounded compaction: batched per-block sorts are the
# cheapest reorder primitive on TPU (BENCH_NOTES.md), matching the top-k
# selection and quick-engine cleanup block size.
_BLOCK = 8192


def compact_bounded(mask: jax.Array, *streams, max_out: int,
                    block: int = _BLOCK):
    """Stably pack rows where mask is True to the front, when the caller can
    BOUND the number of selected rows by `max_out` (e.g. a group-aggregate
    whose key domain is known, ops/hashagg.py `max_groups`).

    `compact` pays one GLOBAL stable n-row sort.  Here each `block`-row
    block is sorted independently (one batched lax.sort — far cheaper than
    the global sort because every block is VMEM-resident), and the selected
    rows are assembled from the block fronts with small scans plus gathers
    whose cost scales with max_out, not n.

    Returns (count, packed_streams...) with streams of length `max_out`
    (not n): rows past `count` are zero-filled.  `count` is the TRUE number
    of selected rows; if count > max_out the first max_out selected rows
    are still returned exactly (truncation, never corruption) and the
    caller must treat the overflow per its own protocol.
    """
    if mask.ndim != 1:
        raise ValueError("mask must be 1-D")
    n = mask.shape[0]
    if n == 0:
        zeros = tuple(jnp.zeros((max_out,), s.dtype) for s in streams)
        return (jnp.int32(0),) + zeros
    if n <= block or n <= 2 * max_out:
        # blocked assembly cannot help: a single block IS the global sort,
        # and max_out ~ n means the gathers move ~everything anyway
        out = compact(mask, *streams, fill=0)
        return (out[0],) + tuple(s[:max_out] if n >= max_out else
                                 jnp.pad(s, (0, max_out - n))
                                 for s in out[1:])

    c = -(-n // block)
    pad = c * block - n
    maskp = jnp.pad(mask, (0, pad), constant_values=False)
    inv = (~maskp).astype(jnp.uint8)
    mats = [inv.reshape(c, block)]
    mats += [jnp.pad(s, (0, pad)).reshape(c, block) for s in streams]
    out = jax.lax.sort(tuple(mats), dimension=1, num_keys=1, is_stable=True)

    # per-block selected counts -> each block's output offset
    cnt_b = jnp.sum(maskp.reshape(c, block), axis=1, dtype=jnp.int32)
    offs = jnp.cumsum(cnt_b) - cnt_b  # exclusive
    total = (offs[-1] + cnt_b[-1]).astype(jnp.int32)

    # source block of output row i: scatter-add block-start marks at the
    # offsets (empty blocks collide on one position; add absorbs that,
    # blocks past max_out drop), then a running count - 1
    marks = jnp.zeros(max_out, jnp.int32)
    has = cnt_b > 0
    marks = marks.at[jnp.where(has, offs, max_out)].add(
        has.astype(jnp.int32), mode="drop")
    b_of = jnp.cumsum(marks) - 1
    i = jnp.arange(max_out, dtype=jnp.int32)
    live = i < jnp.minimum(total, max_out)
    flat = jnp.where(live, b_of * block + (i - offs[b_of]), 0)
    packed = tuple(
        jnp.where(live, m.reshape(-1)[flat], m.dtype.type(0))
        for m in out[1:])
    return (total,) + packed


def filter_rows(predicate, keys: jax.Array, *payloads):
    """Filter a table by a row predicate over its keys.

    `predicate` is a callable keys -> bool mask (or an existing mask array).
    Returns (count, keys_packed, payloads_packed...).  Jittable.
    """
    mask = predicate(keys) if callable(predicate) else predicate
    return compact(mask, keys, *payloads)
