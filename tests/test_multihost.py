"""Hierarchical two-phase (DCN x ICI) sort on the virtual 8-device mesh."""

import numpy as np
import pytest

from simd_radix_sort_tpu.parallel import dist_sort, multihost

MIX = np.uint64(0x9E3779B97F4A7C15)


def _mesh(num_slices):
    return multihost.make_hierarchical_mesh(num_slices=num_slices)


def _check(keys, pays, out, ascending=True):
    out_k, out_p, counts, overflow, meta = out
    assert not np.asarray(overflow).any()
    got_k, got_p = dist_sort.gather_result(out_k, out_p, counts, meta)
    assert got_k.shape == keys.shape
    comp = np.asarray(got_k)
    if comp.dtype == np.float64:
        comp = comp.view(np.uint64)
        ref = keys.view(np.uint64)
    else:
        ref = keys
    order = comp[:-1] <= comp[1:] if ascending else comp[:-1] >= comp[1:]
    if comp.dtype.kind == "f":
        order = order | np.isnan(comp[:-1]) | np.isnan(comp[1:])
    assert np.all(order)
    assert np.array_equal(np.sort(comp), np.sort(ref))
    if pays:
        with np.errstate(over="ignore"):
            pair_in = (ref.astype(np.uint64) * MIX) ^ pays[0].astype(np.uint64)
            pair_out = ((comp.astype(np.uint64) * MIX)
                        ^ np.asarray(got_p[0]).astype(np.uint64))
        assert np.array_equal(np.sort(pair_in), np.sort(pair_out))


@pytest.mark.parametrize("num_slices", [2, 4])
@pytest.mark.parametrize("dtype", [np.uint32, np.uint64])
def test_hierarchical_sort(num_slices, dtype):
    rng = np.random.default_rng(60)
    n = 8 * 512
    keys = rng.integers(0, np.iinfo(dtype).max, n, dtype=dtype)
    pay = rng.integers(0, 2**64, n, dtype=np.uint64)
    out = multihost.hierarchical_sort(keys, pay, mesh=_mesh(num_slices))
    _check(keys, (pay,), out)


def test_hierarchical_sort_duplicate_heavy():
    """Zero-like keys: the position tie-break must keep slices balanced
    (no overflow at factor 2 even with ONE distinct key)."""
    n = 8 * 512
    keys = np.zeros(n, dtype=np.int32)
    pay = np.arange(n, dtype=np.uint64)
    out = multihost.hierarchical_sort(keys, pay, mesh=_mesh(2))
    _check(keys, (pay,), out)


def test_hierarchical_sort_presorted_descending():
    n = 8 * 256
    keys = np.arange(n, dtype=np.uint32)
    out = multihost.hierarchical_sort(keys, mesh=_mesh(2), ascending=False)
    _check(keys, (), out, ascending=False)


@pytest.mark.parametrize("chunks", [1, 2, 4])
def test_hierarchical_sort_chunked_exchange(chunks):
    """The double-buffered chunk count must not change results."""
    rng = np.random.default_rng(61)
    n = 8 * 512
    keys = rng.integers(0, 2**63, n, dtype=np.int64)
    pay = rng.integers(0, 2**32, n, dtype=np.uint32)
    out = multihost.hierarchical_sort(keys, pay, mesh=_mesh(2),
                                      exchange_chunks=chunks)
    _check(keys, (pay,), out)


def test_hierarchical_equals_flat_sort():
    """Two-phase output must equal the flat single-axis splitter sort."""
    rng = np.random.default_rng(62)
    n = 8 * 384
    keys = rng.integers(0, 1000, n, dtype=np.uint32)
    pay = rng.integers(0, 2**64, n, dtype=np.uint64)
    out2 = multihost.hierarchical_sort(keys, pay, mesh=_mesh(2))
    k2, p2 = dist_sort.gather_result(out2[0], out2[1], out2[2], out2[4])
    flat_k, flat_p, counts, ov, meta = dist_sort.distributed_sort(keys, pay)
    k1, p1 = dist_sort.gather_result(flat_k, flat_p, counts, meta)
    assert np.array_equal(k1, k2)
    # payload multisets per key must agree (order within ties may differ)
    key_pairs = lambda k, p: np.sort((k.astype(np.uint64) << np.uint64(1))
                                     ^ p[0])
    assert np.array_equal(np.sort(p1[0]), np.sort(p2[0]))


def test_make_hierarchical_mesh_validation():
    with pytest.raises(ValueError, match="not divisible"):
        multihost.make_hierarchical_mesh(num_slices=3)


@pytest.mark.parametrize("num_slices", [2, 4])
def test_hierarchical_group_aggregate(num_slices):
    rng = np.random.default_rng(64)
    n = 8 * 512
    keys = rng.integers(-30, 30, n).astype(np.int32)
    vals = rng.integers(1, 1000, n).astype(np.int64)
    ng, gk, (s, c, mean) = multihost.hierarchical_group_aggregate(
        keys, vals, agg=("sum", "count", "mean"), mesh=_mesh(num_slices))
    uniq = np.unique(keys)
    assert ng == len(uniq)
    assert np.array_equal(gk, uniq)
    groups = [vals[keys == u] for u in uniq]
    assert np.array_equal(s, [g.sum() for g in groups])
    assert np.array_equal(c, [len(g) for g in groups])
    assert np.allclose(mean, [g.mean() for g in groups])


def test_hierarchical_group_aggregate_f64_keys_single_agg():
    rng = np.random.default_rng(65)
    n = 8 * 256
    keys = rng.choice(np.array([-2.5, -0.0, 0.0, 1.25, 3e200], np.float64), n)
    vals = rng.integers(1, 100, n).astype(np.int64)
    ng, gk, mx = multihost.hierarchical_group_aggregate(
        keys, vals, agg="max", mesh=_mesh(2))
    # totalOrder grouping: -0.0 and 0.0 are DISTINCT groups
    kb = keys.view(np.uint64)
    uniq_bits = np.unique(kb)
    assert ng == len(uniq_bits)
    got_bits = np.asarray(gk).view(np.uint64)
    # every bit-distinct group present exactly once with the right max
    assert set(got_bits.tolist()) == set(uniq_bits.tolist())
    for b, m in zip(got_bits, mx):
        assert m == vals[kb == b].max()


def test_hierarchical_group_aggregate_single_hot_key():
    """One distinct key: after local grouping each device contributes one
    partial row, so even total skew cannot overflow."""
    n = 8 * 512
    keys = np.full(n, 7, dtype=np.uint64)
    vals = np.arange(n, dtype=np.int64)
    ng, gk, s = multihost.hierarchical_group_aggregate(
        keys, vals, agg="sum", mesh=_mesh(2))
    assert ng == 1 and gk[0] == 7 and s[0] == vals.sum()


def test_hierarchical_group_aggregate_one_slice_skips_tier1():
    """num_slices=1: tier 1 feeds tier 2 directly (no redundant combine);
    results identical to the flat aggregate."""
    rng = np.random.default_rng(66)
    n = 8 * 256
    keys = rng.integers(0, 100, n).astype(np.uint32)
    vals = rng.integers(1, 50, n).astype(np.int32)
    ng, gk, (s, mn) = multihost.hierarchical_group_aggregate(
        keys, vals, agg=("sum", "min"), mesh=_mesh(1))
    uniq = np.unique(keys)
    assert ng == len(uniq)
    assert np.array_equal(gk, uniq)
    assert np.array_equal(s, [vals[keys == u].sum() for u in uniq])
    assert np.array_equal(mn, [vals[keys == u].min() for u in uniq])
