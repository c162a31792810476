"""Core type utilities for the TPU-native sort engine.

TPU-native re-design of the reference's type layer
(/root/reference/src/common.hpp:14-103 and src/data.hpp:25-53): instead of
`UInt<Bytes>` template machinery we keep a small dtype registry mapping every
supported key dtype to its same-width unsigned carrier, and split 64-bit
carriers into (hi, lo) uint32 pairs so the TPU hot path never relies on
emulated 64-bit lanes.
"""

from __future__ import annotations

import numpy as np

# The 10 key dtypes of the reference test matrix (src/test.cpp:156-168).
KEY_DTYPES = (
    np.dtype(np.uint8),
    np.dtype(np.uint16),
    np.dtype(np.uint32),
    np.dtype(np.uint64),
    np.dtype(np.int8),
    np.dtype(np.int16),
    np.dtype(np.int32),
    np.dtype(np.int64),
    np.dtype(np.float32),
    np.dtype(np.float64),
)

# Payload dtypes are any fixed-width scalar (reference allows arbitrary
# payload tuples, src/radix_sort.hpp:297-312).
PAYLOAD_DTYPES = KEY_DTYPES

_UNSIGNED_BY_WIDTH = {
    1: np.dtype(np.uint8),
    2: np.dtype(np.uint16),
    4: np.dtype(np.uint32),
    8: np.dtype(np.uint64),
}

# Labels follow the reference's type_name<T> convention
# (src/common.hpp:16-39) so .dat benchmark tables line up.
TYPE_NAMES = {
    np.dtype(np.uint8): "uint8",
    np.dtype(np.uint16): "uint16",
    np.dtype(np.uint32): "uint32",
    np.dtype(np.uint64): "uint64",
    np.dtype(np.int8): "int8",
    np.dtype(np.int16): "int16",
    np.dtype(np.int32): "int32",
    np.dtype(np.int64): "int64",
    np.dtype(np.float32): "float",
    np.dtype(np.float64): "double",
}

NAME_TO_DTYPE = {v: k for k, v in TYPE_NAMES.items()}


def type_name(dtype) -> str:
    return TYPE_NAMES[np.dtype(dtype)]


def unsigned_of(dtype) -> np.dtype:
    """Same-width unsigned carrier dtype for a key dtype."""
    return _UNSIGNED_BY_WIDTH[np.dtype(dtype).itemsize]


def is_signed_int(dtype) -> bool:
    return np.dtype(dtype).kind == "i"


def is_unsigned_int(dtype) -> bool:
    return np.dtype(dtype).kind == "u"


def is_float(dtype) -> bool:
    return np.dtype(dtype).kind == "f"


def key_bits(dtype) -> int:
    return np.dtype(dtype).itemsize * 8


def is_power_of_two(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0


def element_size(key_dtype, payload_dtypes) -> int:
    """Byte size of the combined-layout element (key first, then payloads),
    mirroring DataElement<K, Ps...> (src/data.hpp:25-40).  The reference packs
    without padding and requires a power-of-two total for the combined sort
    path (src/radix_sort.hpp:318-319)."""
    return np.dtype(key_dtype).itemsize + sum(
        np.dtype(p).itemsize for p in payload_dtypes
    )


def check_64bit_ok(dtype) -> None:
    """Raise if a 64-bit stream would be silently truncated because jax
    x64 mode is off (jnp.asarray would downcast, corrupting data)."""
    import jax
    dtype = np.dtype(dtype)
    if dtype.itemsize == 8 and not jax.config.read("jax_enable_x64"):
        raise ValueError(
            f"dtype {dtype} requires 64-bit mode; set JAX_ENABLE_X64=1 or "
            'jax.config.update("jax_enable_x64", True) before creating '
            "arrays")
