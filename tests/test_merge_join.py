"""merge_join_indices: the padded sort-merge join primitive."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from simd_radix_sort_tpu.ops import hashjoin
from simd_radix_sort_tpu.utils import transforms


def _ops(arr, dtype):
    u = transforms.to_sortable_np(np.asarray(arr, dtype), True)
    if u.dtype == np.uint64:
        return (jnp.asarray((u >> np.uint64(32)).astype(np.uint32)),
                jnp.asarray((u & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
    return (jnp.asarray(u),)


@pytest.mark.parametrize("dtype", [np.uint32, np.uint64])
def test_merge_join_indices_matches(dtype):
    rng = np.random.default_rng(50)
    pk = rng.integers(0, 40, 300).astype(dtype)
    bk = rng.integers(0, 40, 200).astype(dtype)
    # pad both sides: 44 probe pads, 56 build pads with junk contents
    pk_pad = np.concatenate([pk, rng.integers(0, 40, 44).astype(dtype)])
    bk_pad = np.concatenate([bk, rng.integers(0, 40, 56).astype(dtype)])
    cap = 8192
    total, pidx, bidx = hashjoin.merge_join_indices(
        _ops(pk_pad, dtype), len(pk), _ops(bk_pad, dtype), len(bk), cap)
    total = int(total)
    want = sorted((int(k), i, j) for i, k in enumerate(pk)
                  for j, kb in enumerate(bk) if kb == k)
    assert total == len(want)
    got = sorted((int(pk[i]), int(i), int(j))
                 for i, j in zip(np.asarray(pidx)[:total],
                                 np.asarray(bidx)[:total]))
    assert got == want


def test_saturating_cumsum_exact_and_saturated():
    # exact below the bound
    c = np.array([0, 3, 1, 0, 7, 2], np.int32)
    got = np.asarray(hashjoin._saturating_cumsum(jnp.asarray(c)))
    assert got.tolist() == np.cumsum(c).tolist()
    # saturates (instead of wrapping) once the true sum passes _SAT32,
    # and every unsaturated prefix stays exact
    big = np.array([5, 2**30, 2**30, 3], np.int32)
    got = np.asarray(hashjoin._saturating_cumsum(jnp.asarray(big)))
    assert got[0] == 5
    assert (got[1:] == hashjoin._SAT32).all()
    assert (np.diff(got) >= 0).all()  # monotone: searchsorted stays valid


def test_merge_join_indices_x64_off_matches():
    # the x64-off saturating-scan path must agree with the int64 path
    import jax
    rng = np.random.default_rng(51)
    pk = rng.integers(0, 30, 256).astype(np.uint32)
    bk = rng.integers(0, 30, 128).astype(np.uint32)
    cap = 4096
    ref = hashjoin.merge_join_indices(
        _ops(pk, np.uint32), 256, _ops(bk, np.uint32), 128, cap)
    with jax.enable_x64(False):
        got = hashjoin.merge_join_indices(
            _ops(pk, np.uint32), 256, _ops(bk, np.uint32), 128, cap)
    assert int(ref[0]) == int(got[0])
    for a, b in zip(ref[1:], got[1:]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_merge_join_indices_capacity_bound():
    # the saturating-scan exactness bound applies only with x64 off; with
    # x64 on the int64 cumsum is exact for any int32 capacity and large
    # capacities must NOT be rejected (round-3 review)
    with jax.enable_x64(False):
        with pytest.raises(ValueError, match="capacity"):
            hashjoin.merge_join_indices(
                _ops(np.zeros(4, np.uint32), np.uint32), 4,
                _ops(np.zeros(4, np.uint32), np.uint32), 4, 1 << 30)


def test_merge_join_indices_truncation():
    pk = np.zeros(64, np.uint32)
    bk = np.zeros(64, np.uint32)
    total, pidx, bidx = hashjoin.merge_join_indices(
        _ops(pk, np.uint32), 64, _ops(bk, np.uint32), 64, 100)
    assert int(total) == 64 * 64  # reported total exceeds capacity
    assert np.asarray(pidx).shape == (100,)


def test_merge_join_indices_both_empty():
    """m == 0 must trace and return zero matches (reachable end to end
    via a join of two empty tables — round-3 review)."""
    e = _ops(np.zeros(0, np.uint32), np.uint32)
    total, pidx, bidx = hashjoin.merge_join_indices(e, 0, e, 0, 8)
    assert int(total) == 0
    assert np.asarray(pidx).shape == (8,)


def test_merge_join_indices_int_mask_rejected():
    """An integer 0/1 validity mask must raise, not silently flag every
    row invalid (~1 == -2; round-3 review)."""
    ops = _ops(np.zeros(4, np.uint32), np.uint32)
    mask = np.ones(4, np.int32)
    with pytest.raises(TypeError, match="boolean"):
        hashjoin.merge_join_indices(ops, jnp.asarray(mask), ops,
                                    jnp.asarray(mask), 8)
