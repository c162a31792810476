"""Order-preserving bit transforms: the TPU-native replacement for the
reference's per-bit direction logic.

The reference decides sort direction per (bit, side) at compile time in
`bitDirUp` (/root/reference/src/radix_sort.hpp:51-64): unsigned ints use `Up`
directly, signed ints flip direction on the sign bit, and floats additionally
flip all lower bits on the negative side, exploiting IEEE-754 sign-magnitude.
That trick exists so the AVX-512 code never rewrites the keys.

On TPU the idiomatic equivalent is a single vectorized pass that maps every
key dtype to an unsigned integer whose natural order equals the key order:

  * unsigned:  u = x
  * signed:    u = bits(x) XOR sign_mask
  * float:     u = bits(x) XOR (x < 0 ? all_ones : sign_mask)   (IEEE totalOrder)
  * descending: u = NOT u

This produces byte-for-byte the same ordering the reference's per-bit logic
induces (including -0.0 < +0.0 and NaN ordering by bit pattern), verified by
the differential tests in tests/test_transforms.py.

64-bit carriers are split into (hi, lo) uint32 pairs with `split64` so that
TPU hot paths never depend on emulated 64-bit vector lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import common


def _masks(nbits: int):
    sign = 1 << (nbits - 1)
    ones = (1 << nbits) - 1
    return sign, ones


# ---------------------------------------------------------------------------
# JAX versions (jittable, TPU-ready)
# ---------------------------------------------------------------------------


def sortable_from_bits(bits: jax.Array, dtype, ascending: bool = True) -> jax.Array:
    """Apply the order-preserving transform to the raw bit pattern of a key
    of `dtype`, already held in its unsigned carrier (no bitcast performed).
    Used by the combined-layout path where keys arrive as reassembled bytes."""
    dtype = np.dtype(dtype)
    udtype = common.unsigned_of(dtype)
    nbits = dtype.itemsize * 8
    sign, ones = _masks(nbits)

    b = bits.astype(udtype)
    if common.is_unsigned_int(dtype):
        u = b
    elif common.is_signed_int(dtype):
        u = b ^ udtype.type(sign)
    elif common.is_float(dtype):
        neg = (b >> udtype.type(nbits - 1)).astype(jnp.bool_)
        mask = jnp.where(neg, udtype.type(ones), udtype.type(sign))
        u = b ^ mask
    else:
        raise TypeError(f"unsupported key dtype {dtype}")
    if not ascending:
        u = ~u
    return u.astype(udtype)


def to_sortable(keys: jax.Array, ascending: bool = True) -> jax.Array:
    """Map keys to a same-width unsigned array with matching order."""
    dtype = np.dtype(keys.dtype)
    udtype = common.unsigned_of(dtype)
    if common.is_unsigned_int(dtype):
        bits = keys
    else:
        bits = jax.lax.bitcast_convert_type(keys, udtype)
    return sortable_from_bits(bits, dtype, ascending)


def from_sortable(u: jax.Array, dtype, ascending: bool = True) -> jax.Array:
    """Inverse of `to_sortable`."""
    dtype = np.dtype(dtype)
    udtype = common.unsigned_of(dtype)
    nbits = dtype.itemsize * 8
    sign, ones = _masks(nbits)

    if not ascending:
        u = ~u
    if common.is_unsigned_int(dtype):
        return u.astype(udtype)
    if common.is_signed_int(dtype):
        return jax.lax.bitcast_convert_type(u ^ udtype.type(sign), dtype)
    if common.is_float(dtype):
        was_pos = (u >> udtype.type(nbits - 1)).astype(jnp.bool_)
        mask = jnp.where(was_pos, udtype.type(sign), udtype.type(ones))
        return jax.lax.bitcast_convert_type(u ^ mask, dtype)
    raise TypeError(f"unsupported key dtype {dtype}")


def split64(u: jax.Array):
    """Split a uint64 array into (hi, lo) uint32.  Lexicographic order of
    (hi, lo) equals the uint64 order; used so key comparisons run on native
    32-bit TPU lanes."""
    parts = jax.lax.bitcast_convert_type(u, jnp.uint32)  # (..., 2) little-endian
    return parts[..., 1], parts[..., 0]


def merge64(hi: jax.Array, lo: jax.Array) -> jax.Array:
    parts = jnp.stack([lo, hi], axis=-1)
    return jax.lax.bitcast_convert_type(parts, jnp.uint64)


def key_operands(keys: jax.Array, ascending: bool = True, logical_dtype=None):
    """Transform keys and return a tuple of uint operands whose lexicographic
    order equals the requested key order (1 operand for <=32-bit keys, 2
    uint32 operands for 64-bit keys).

    If `logical_dtype` is given, `keys` must already hold the raw BIT PATTERN
    of keys of that dtype in the matching unsigned carrier.  This is how f64
    keys enter TPU programs: the axon/TPU XLA stack cannot lower
    bitcast-convert *from* f64 (64-bit rewrite gap), so callers view the bits
    on the host and pass uint64 (ops/sort.py handles this automatically)."""
    if logical_dtype is None:
        u = to_sortable(keys, ascending)
    else:
        u = sortable_from_bits(keys, logical_dtype, ascending)
    if u.dtype == jnp.uint64:
        return split64(u)
    return (u,)


def bits_from_sortable(u: jax.Array, dtype, ascending: bool = True) -> jax.Array:
    """Inverse of `sortable_from_bits`: recover the raw key bit pattern in
    its unsigned carrier (no bitcast to the logical dtype)."""
    dtype = np.dtype(dtype)
    udtype = common.unsigned_of(dtype)
    nbits = dtype.itemsize * 8
    sign, ones = _masks(nbits)

    u = u.astype(udtype)
    if not ascending:
        u = ~u
    if common.is_unsigned_int(dtype):
        return u
    if common.is_signed_int(dtype):
        return u ^ udtype.type(sign)
    if common.is_float(dtype):
        was_pos = (u >> udtype.type(nbits - 1)).astype(jnp.bool_)
        mask = jnp.where(was_pos, udtype.type(sign), udtype.type(ones))
        return u ^ mask
    raise TypeError(f"unsupported key dtype {dtype}")


def keys_from_operands(ops, dtype, ascending: bool = True,
                       as_bits: bool = False) -> jax.Array:
    """Reconstruct keys from sorted key operands.  With as_bits=True the raw
    bit pattern is returned in the unsigned carrier instead of bitcasting to
    the logical dtype — required for f64 keys on TPU stacks whose f64 device
    storage is lossy (see ops/sort.py)."""
    if len(ops) == 2:
        u = merge64(ops[0], ops[1])
    else:
        (u,) = ops
    if as_bits:
        return bits_from_sortable(u, dtype, ascending)
    return from_sortable(u, dtype, ascending)


# ---------------------------------------------------------------------------
# NumPy versions (host-side model, used by the oracle and differential tests)
# ---------------------------------------------------------------------------


def to_sortable_np(keys: np.ndarray, ascending: bool = True) -> np.ndarray:
    dtype = np.dtype(keys.dtype)
    udtype = common.unsigned_of(dtype)
    nbits = dtype.itemsize * 8
    sign, ones = _masks(nbits)

    if common.is_unsigned_int(dtype):
        u = keys.copy()
    elif common.is_signed_int(dtype):
        u = keys.view(udtype) ^ udtype.type(sign)
    elif common.is_float(dtype):
        b = keys.view(udtype)
        neg = (b >> udtype.type(nbits - 1)).astype(bool)
        mask = np.where(neg, udtype.type(ones), udtype.type(sign))
        u = b ^ mask
    else:
        raise TypeError(f"unsupported key dtype {dtype}")
    if not ascending:
        u = ~u
    return u.astype(udtype)


def from_sortable_np(u: np.ndarray, dtype, ascending: bool = True) -> np.ndarray:
    dtype = np.dtype(dtype)
    udtype = common.unsigned_of(dtype)
    nbits = dtype.itemsize * 8
    sign, ones = _masks(nbits)

    u = np.asarray(u, dtype=udtype)
    if not ascending:
        u = ~u
    if common.is_unsigned_int(dtype):
        return u.astype(dtype)
    if common.is_signed_int(dtype):
        return (u ^ udtype.type(sign)).view(dtype)
    if common.is_float(dtype):
        was_pos = (u >> udtype.type(nbits - 1)).astype(bool)
        mask = np.where(was_pos, udtype.type(sign), udtype.type(ones))
        return (u ^ mask).view(dtype)
    raise TypeError(f"unsupported key dtype {dtype}")


def sort_np(keys: np.ndarray, *payloads: np.ndarray, ascending: bool = True):
    """Scalar reference model: stable argsort on transformed keys.  Plays the
    role of the reference's BitSorterSequential differential baseline
    (src/radix_sort.hpp:66-92)."""
    u = to_sortable_np(keys, ascending)
    perm = np.argsort(u, kind="stable")
    return (keys[perm],) + tuple(p[perm] for p in payloads)
