"""Unit tests for the order-preserving bit transforms (utils/transforms.py).

Property: for every key dtype, to_sortable is a bijection whose unsigned
order equals the reference's bit-partition order (bitDirUp semantics,
/root/reference/src/radix_sort.hpp:51-64) — including float edge cases the
reference handles implicitly via IEEE-754 bit tricks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simd_radix_sort_tpu.utils import common, transforms
from simd_radix_sort_tpu.utils import data as D


def _edge_values(dtype):
    dtype = np.dtype(dtype)
    if dtype.kind in "iu":
        info = np.iinfo(dtype)
        vals = [info.min, info.min + 1, -1, 0, 1, info.max - 1, info.max]
        return np.array(sorted({v for v in vals if info.min <= v <= info.max}),
                        dtype=dtype)
    # float edge cases: signed zeros, infinities, NaNs with payloads,
    # denormals — ordered here by bit pattern (reference total order)
    f = np.finfo(dtype)
    u = common.unsigned_of(dtype)
    nbits = dtype.itemsize * 8
    neg_nan = np.array([(1 << (nbits - 1)) | ((1 << (nbits - 1)) - 1)],
                       dtype=u).view(dtype)[0]
    pos_nan = np.array([((1 << (nbits - 1)) - 1)], dtype=u).view(dtype)[0]
    return np.array([neg_nan, -np.inf, f.min, -1.0, -f.tiny, -0.0,
                     0.0, f.tiny, 1.0, f.max, np.inf, pos_nan], dtype=dtype)


@pytest.mark.parametrize("dtype", common.KEY_DTYPES, ids=common.type_name)
@pytest.mark.parametrize("ascending", [True, False])
def test_roundtrip_and_order(dtype, ascending):
    keys = np.concatenate([
        _edge_values(dtype),
        D.make_keys(500, dtype, D.Distribution.UNIFORM, seed=7),
        D.make_keys(100, dtype, D.Distribution.GAUSSIAN, seed=8),
    ])
    u = transforms.to_sortable_np(keys, ascending)
    back = transforms.from_sortable_np(u, dtype, ascending)
    assert np.array_equal(back.view(np.uint8), keys.view(np.uint8))

    # order of u must equal the reference bit order of keys
    ref_order = _reference_order_np(keys)
    got = np.argsort(u, kind="stable")
    want = np.argsort(ref_order if ascending else _flip(ref_order),
                      kind="stable")
    assert np.array_equal(keys[got].view(np.uint8), keys[want].view(np.uint8))


def _reference_order_np(keys):
    """Independent model of the reference's induced total order: MSB-first
    bit partition with bitDirUp direction logic == (signed: offset binary;
    float: sign-magnitude to offset binary)."""
    dtype = np.dtype(keys.dtype)
    u = keys.view(common.unsigned_of(dtype)).astype(np.uint64)
    nbits = dtype.itemsize * 8
    if dtype.kind == "i":
        return u ^ np.uint64(1 << (nbits - 1))
    if dtype.kind == "f":
        sign = (u >> np.uint64(nbits - 1)).astype(bool)
        flipped = np.where(sign, ~u & np.uint64((1 << nbits) - 1),
                           u | np.uint64(1 << (nbits - 1)))
        return flipped
    return u


def _flip(order):
    return np.iinfo(np.uint64).max - order


@pytest.mark.parametrize("dtype", common.KEY_DTYPES, ids=common.type_name)
def test_jax_matches_numpy(dtype):
    keys = np.concatenate([
        _edge_values(dtype),
        D.make_keys(300, dtype, D.Distribution.UNIFORM, seed=3),
    ])
    for ascending in (True, False):
        u_np = transforms.to_sortable_np(keys, ascending)
        u_jax = np.asarray(transforms.to_sortable(jnp.asarray(keys), ascending))
        assert np.array_equal(u_np, u_jax)
        back = np.asarray(transforms.from_sortable(
            jnp.asarray(u_np), dtype, ascending))
        assert np.array_equal(back.view(np.uint8), keys.view(np.uint8))


def test_split_merge64():
    x = D.make_keys(257, np.uint64, D.Distribution.UNIFORM, seed=1)
    hi, lo = transforms.split64(jnp.asarray(x))
    assert np.array_equal(np.asarray(hi), (x >> np.uint64(32)).astype(np.uint32))
    assert np.array_equal(np.asarray(lo), x.astype(np.uint32))
    assert np.array_equal(np.asarray(transforms.merge64(hi, lo)), x)


@pytest.mark.parametrize("dtype", common.KEY_DTYPES, ids=common.type_name)
def test_edge_values_strictly_increasing(dtype):
    """_edge_values lists each dtype's edge cases in the reference total
    order (bit-partition order); the transform must be strictly increasing
    on them.  For floats this pins -NaN < -inf < -1 < -0 < +0 < +inf < +NaN."""
    u = transforms.to_sortable_np(_edge_values(dtype), True)
    assert np.all(u[:-1] < u[1:])


def test_float_order_matches_value_order_when_finite():
    """On finite, non-zero floats the induced order must equal numeric order."""
    for dtype in (np.float32, np.float64):
        vals = D.make_keys(2000, dtype, D.Distribution.GAUSSIAN, seed=11)
        u = transforms.to_sortable_np(vals, True)
        assert np.array_equal(np.argsort(u, kind="stable"),
                              np.argsort(vals, kind="stable"))


def test_sortable_from_bits_matches():
    for dtype in common.KEY_DTYPES:
        keys = np.concatenate([
            _edge_values(dtype),
            D.make_keys(100, dtype, D.Distribution.UNIFORM, seed=5)])
        bits = keys.view(common.unsigned_of(dtype))
        got = np.asarray(transforms.sortable_from_bits(
            jnp.asarray(bits), dtype, True))
        want = transforms.to_sortable_np(keys, True)
        assert np.array_equal(got, want), dtype
