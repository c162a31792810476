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


def filter_rows(predicate, keys: jax.Array, *payloads):
    """Filter a table by a row predicate over its keys.

    `predicate` is a callable keys -> bool mask (or an existing mask array).
    Returns (count, keys_packed, payloads_packed...).  Jittable.
    """
    mask = predicate(keys) if callable(predicate) else predicate
    return compact(mask, keys, *payloads)
