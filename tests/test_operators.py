"""Tests for the query operator set: filter, group aggregate, join.

Each operator is checked against a plain-NumPy model on randomized tables.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from simd_radix_sort_tpu.ops import filter as filter_ops
from simd_radix_sort_tpu.ops import hashagg, hashjoin
from simd_radix_sort_tpu.utils import data as D


def test_compact_stable():
    rng = np.random.default_rng(0)
    n = 1000
    keys = rng.integers(0, 1000, n).astype(np.int32)
    vals = rng.integers(0, 2**62, n).astype(np.uint64)
    mask = keys % 3 == 0
    count, k2, v2 = filter_ops.compact(jnp.asarray(mask), jnp.asarray(keys),
                                       jnp.asarray(vals))
    count = int(count)
    assert count == mask.sum()
    assert np.array_equal(np.asarray(k2)[:count], keys[mask])
    assert np.array_equal(np.asarray(v2)[:count], vals[mask])
    # tail holds the non-selected rows, stably
    assert np.array_equal(np.asarray(k2)[count:], keys[~mask])


def test_compact_fill_and_edges():
    count, x = filter_ops.compact(jnp.asarray(np.array([], dtype=bool)),
                                  jnp.asarray(np.array([], dtype=np.int32)))
    assert int(count) == 0 and x.shape == (0,)
    count, x = filter_ops.compact(
        jnp.asarray(np.array([True, False, True])),
        jnp.asarray(np.array([5, 6, 7], dtype=np.int32)), fill=-1)
    assert int(count) == 2
    assert np.asarray(x).tolist() == [5, 7, -1]


def test_filter_rows_predicate():
    keys = D.make_keys(500, np.float32, D.Distribution.GAUSSIAN, 2)
    (pay,) = D.make_payloads(keys, [np.uint32], "fast")
    count, k2, p2 = filter_ops.filter_rows(lambda k: k > 0, jnp.asarray(keys),
                                           jnp.asarray(pay))
    count = int(count)
    m = keys > 0
    assert count == m.sum()
    assert np.array_equal(np.asarray(k2)[:count], keys[m])
    assert np.array_equal(np.asarray(p2)[:count], pay[m])


def _np_groupby(keys, vals):
    order = np.argsort(keys, kind="stable")
    k, v = keys[order], vals[order]
    uniq, idx = np.unique(k, return_index=True)
    groups = np.split(v, idx[1:])
    return uniq, groups


def test_group_aggregate_all_aggs():
    rng = np.random.default_rng(1)
    n = 2000
    keys = rng.integers(0, 57, n).astype(np.int32)
    vals = rng.integers(-100, 100, n).astype(np.int32)
    ng, gk, (sums, counts, mins, maxs) = hashagg.group_aggregate(
        jnp.asarray(keys), jnp.asarray(vals),
        aggs=("sum", "count", "min", "max"))
    ng = int(ng)
    uniq, groups = _np_groupby(keys, vals)
    assert ng == len(uniq)
    assert np.array_equal(np.asarray(gk)[:ng], uniq)
    assert np.array_equal(np.asarray(sums[0])[:ng],
                          np.array([g.sum() for g in groups]))
    assert np.array_equal(np.asarray(counts)[:ng],
                          np.array([len(g) for g in groups]))
    assert np.array_equal(np.asarray(mins[0])[:ng],
                          np.array([g.min() for g in groups]))
    assert np.array_equal(np.asarray(maxs[0])[:ng],
                          np.array([g.max() for g in groups]))


def test_group_aggregate_float_mean_multi_stream():
    rng = np.random.default_rng(2)
    n = 999
    keys = rng.integers(0, 10, n).astype(np.uint64)
    v1 = rng.normal(size=n).astype(np.float32)
    v2 = rng.integers(0, 1000, n).astype(np.uint32)
    ng, gk, (means,) = hashagg.group_aggregate(
        jnp.asarray(keys), (jnp.asarray(v1), jnp.asarray(v2)), aggs=("mean",))
    ng = int(ng)
    uniq, g1 = _np_groupby(keys, v1)
    _, g2 = _np_groupby(keys, v2)
    assert ng == len(uniq)
    np.testing.assert_allclose(np.asarray(means[0])[:ng],
                               np.array([g.mean() for g in g1]),
                               rtol=1e-5)
    want2 = np.array([g.sum() // len(g) for g in g2], dtype=np.uint64)
    assert np.array_equal(np.asarray(means[1])[:ng].astype(np.uint64), want2)


def test_group_aggregate_single_group_and_empty():
    ng, gk, (s,) = hashagg.group_aggregate(
        jnp.asarray(np.zeros(64, np.int32)),
        jnp.asarray(np.ones(64, np.int32)), aggs=("sum",))
    assert int(ng) == 1 and int(np.asarray(s[0])[0]) == 64
    ng, gk, (s,) = hashagg.group_aggregate(
        jnp.asarray(np.zeros(0, np.int32)),
        jnp.asarray(np.zeros(0, np.int32)), aggs=("sum",))
    assert int(ng) == 0


def test_lookup_join_unique_build():
    rng = np.random.default_rng(3)
    build_k = np.unique(rng.integers(0, 10000, 500).astype(np.int32))
    build_v = (build_k.astype(np.uint32) * 7 + 1)
    probe_k = rng.integers(0, 10000, 1000).astype(np.int32)
    found, counts, (got_v,) = hashjoin.lookup_join(
        jnp.asarray(probe_k), jnp.asarray(build_k), (jnp.asarray(build_v),))
    found = np.asarray(found)
    in_build = np.isin(probe_k, build_k)
    assert np.array_equal(found, in_build)
    assert np.array_equal(np.asarray(counts)[in_build], np.ones(in_build.sum()))
    assert np.array_equal(np.asarray(got_v)[in_build],
                          probe_k[in_build].astype(np.uint32) * 7 + 1)


def test_inner_join_expand_duplicates():
    probe_k = np.array([5, 3, 9, 5, 1], dtype=np.int32)
    probe_v = np.array([50, 30, 90, 51, 10], dtype=np.uint32)
    build_k = np.array([5, 5, 3, 7], dtype=np.int32)
    build_v = np.array([500, 501, 300, 700], dtype=np.uint32)
    total, pidx, pk, (pv,), (bv,) = hashjoin.inner_join_expand(
        jnp.asarray(probe_k), (jnp.asarray(probe_v),),
        jnp.asarray(build_k), (jnp.asarray(build_v),), capacity=16)
    total = int(total)
    # expected matches: probe0(5)x2, probe1(3)x1, probe3(5)x2 = 5 rows
    assert total == 5
    rows = sorted(zip(np.asarray(pk)[:total].tolist(),
                      np.asarray(pv)[:total].tolist(),
                      np.asarray(bv)[:total].tolist()))
    want = sorted([(5, 50, 500), (5, 50, 501), (3, 30, 300),
                   (5, 51, 500), (5, 51, 501)])
    assert rows == want


def test_pipeline_filter_sort_aggregate():
    """The north-star pipeline shape: filter -> sort -> group aggregate
    (BASELINE.json config 4), checked against NumPy end to end."""
    rng = np.random.default_rng(4)
    n = 5000
    keys = rng.integers(0, 200, n).astype(np.int64)
    vals = rng.integers(0, 1000, n).astype(np.int64)
    count, fk, fv = filter_ops.compact(jnp.asarray(keys % 2 == 0),
                                       jnp.asarray(keys), jnp.asarray(vals))
    c = int(count)
    ng, gk, (sums,) = hashagg.group_aggregate(fk[:c], fv[:c], aggs=("sum",))
    m = keys % 2 == 0
    uniq, groups = _np_groupby(keys[m], vals[m])
    assert int(ng) == len(uniq)
    assert np.array_equal(np.asarray(gk)[:int(ng)], uniq)
    assert np.array_equal(np.asarray(sums[0])[:int(ng)],
                          np.array([g.sum() for g in groups]))


def test_top_k_with_payloads():
    from simd_radix_sort_tpu.ops import topk
    rng = np.random.default_rng(21)
    keys = rng.integers(0, 2**31, 20_000, dtype=np.int32)
    pay = keys * np.int32(3)
    kk, pp = topk.top_k(jnp.asarray(keys), jnp.asarray(pay), k=17)
    order = np.argsort(-keys, kind="stable")[:17]
    assert np.array_equal(np.asarray(kk), keys[order])
    assert np.array_equal(np.asarray(pp), pay[order])
    (ks,) = topk.top_k(jnp.asarray(keys), k=5, largest=False)
    assert np.array_equal(np.asarray(ks), np.sort(keys)[:5])


def test_top_k_floats_negative():
    from simd_radix_sort_tpu.ops import topk
    rng = np.random.default_rng(22)
    keys = rng.normal(0, 1, 5000).astype(np.float32)
    (kk,) = topk.top_k(jnp.asarray(keys), k=9)
    assert np.array_equal(np.asarray(kk), np.sort(keys)[::-1][:9])


def test_unique_with_multiplicity():
    from simd_radix_sort_tpu.ops import topk
    keys = np.array([5, 3, 5, 5, 1, 3, 9], dtype=np.int32)
    pay = np.arange(7, dtype=np.uint32) * 10
    count, ku, pu, mult = topk.unique(jnp.asarray(keys), jnp.asarray(pay))
    c = int(count)
    assert c == 4
    assert np.array_equal(np.asarray(ku)[:c], [1, 3, 5, 9])
    assert np.array_equal(np.asarray(mult)[:c], [1, 2, 3, 1])
    # first payload row of each key (stable): 1->40, 3->10, 5->0, 9->60
    assert np.array_equal(np.asarray(pu)[:c], [40, 10, 0, 60])


def test_unique_all_same_and_empty():
    from simd_radix_sort_tpu.ops import topk
    keys = np.full(100, 7, dtype=np.uint8)
    count, ku, mult = topk.unique(jnp.asarray(keys))
    assert int(count) == 1 and int(np.asarray(ku)[0]) == 7
    assert int(np.asarray(mult)[0]) == 100


def test_unique_empty_and_topk_bounds():
    from simd_radix_sort_tpu.ops import topk
    count, ku, mult = topk.unique(jnp.zeros(0, jnp.int32))
    assert int(count) == 0 and np.asarray(ku).shape == (0,)
    with pytest.raises(ValueError):
        topk.top_k(jnp.zeros(3, jnp.int32), k=5)


def test_semi_and_anti_join():
    probe_k = np.array([5, 3, 9, 5, 1], dtype=np.int32)
    probe_v = np.array([50, 30, 90, 51, 10], dtype=np.uint32)
    build_k = np.array([5, 3, 7], dtype=np.int32)
    cnt, pk, pv = hashjoin.semi_join(jnp.asarray(probe_k),
                                     (jnp.asarray(probe_v),),
                                     jnp.asarray(build_k))
    c = int(cnt)
    assert c == 3
    assert np.array_equal(np.asarray(pk)[:c], [5, 3, 5])
    assert np.array_equal(np.asarray(pv)[:c], [50, 30, 51])
    cnt, pk, pv = hashjoin.semi_join(jnp.asarray(probe_k),
                                     (jnp.asarray(probe_v),),
                                     jnp.asarray(build_k), anti=True)
    c = int(cnt)
    assert c == 2
    assert np.array_equal(np.asarray(pk)[:c], [9, 1])
    assert np.array_equal(np.asarray(pv)[:c], [90, 10])


def test_top_k_64bit_blocked_selection():
    """64-bit keys use the two-level blocked selection (no full sort):
    exact results including duplicate-heavy ties across block boundaries."""
    from simd_radix_sort_tpu.ops import topk
    rng = np.random.default_rng(23)
    n = 50_000
    # duplicate-heavy: many ties straddle the 8192-row blocks
    keys = rng.integers(0, 64, n, dtype=np.uint64) << np.uint64(32)
    keys |= rng.integers(0, 16, n, dtype=np.uint64)
    pay = rng.integers(0, 2**63, n, dtype=np.uint64)
    for k, largest in [(1, True), (33, True), (500, False), (4000, True)]:
        out = topk.top_k(jnp.asarray(keys), jnp.asarray(pay), k=k,
                         largest=largest)
        kk, pp = np.asarray(out[0]), np.asarray(out[1])
        # expected order: by key (best first), position-stable within ties
        order = sorted(range(n),
                       key=lambda i: (~keys[i] if largest else keys[i], i))
        order = np.array(order[:k])
        assert np.array_equal(kk, keys[order]), (k, largest)
        assert np.array_equal(pp, pay[order]), (k, largest)


def test_top_k_64bit_large_k_fallback():
    from simd_radix_sort_tpu.ops import topk
    rng = np.random.default_rng(24)
    keys = rng.integers(0, 2**63, 9000, dtype=np.int64)
    k = 8000  # 2k >= block size -> single-sort fallback
    (kk,) = topk.top_k(jnp.asarray(keys), k=k)
    assert np.array_equal(np.asarray(kk), np.sort(keys)[::-1][:k])


def test_sort_multi_composite_keys():
    """ORDER BY col1, col2 DESC: composite lexicographic sort with mixed
    dtypes and per-column directions."""
    import simd_radix_sort_tpu as srs
    rng = np.random.default_rng(70)
    n = 5000
    c1 = rng.integers(0, 20, n).astype(np.int16)
    c2 = rng.normal(0, 1, n).astype(np.float32)
    pay = np.arange(n, dtype=np.uint32)
    (o1, o2), (op,) = srs.sort_multi((c1, c2), pay,
                                     ascending=(True, False), stable=True)
    o1, o2, op = np.asarray(o1), np.asarray(o2), np.asarray(op)
    order = np.lexsort((np.arange(n), -c2, c1))  # stable: c1 asc, c2 desc
    assert np.array_equal(o1, c1[order])
    assert np.array_equal(o2, c2[order])
    assert np.array_equal(op, pay[order])


def test_sort_multi_u64_and_f64_columns():
    import simd_radix_sort_tpu as srs
    rng = np.random.default_rng(71)
    n = 2000
    c1 = rng.integers(0, 5, n).astype(np.uint64) << np.uint64(40)
    c2 = rng.choice(np.array([1.5, -2.25, 0.0, 3e200], np.float64), n)
    (o1, o2), _ = srs.sort_multi((c1, c2), stable=True)
    o1 = np.asarray(o1)
    o2 = np.asarray(o2)
    order = np.lexsort((c2, c1))
    assert np.array_equal(o1, c1[order])
    assert np.array_equal(o2, c2[order])


def test_argsort_dtypes_directions_stability():
    import simd_radix_sort_tpu as srs
    rng = np.random.default_rng(72)
    n = 4000
    for dtype in (np.int16, np.uint32, np.int64, np.float32, np.float64):
        if np.dtype(dtype).kind == "f":
            keys = rng.choice(
                np.array([-5.5, -0.0, 0.0, 2.25, 1e30], dtype), n)
        else:
            keys = rng.integers(0, 50, n).astype(dtype)  # heavy ties
        for ascending in (True, False):
            idx = np.asarray(srs.argsort(keys, ascending=ascending))
            kb = keys.view(f"u{keys.dtype.itemsize}") \
                if np.dtype(dtype).kind == "f" else keys
            got = kb[idx]
            assert idx.dtype == np.int32
            assert np.array_equal(np.sort(idx), np.arange(n))
            # key sequence matches the sorted keys bit-for-bit
            want_keys = np.asarray(srs.sort(keys, ascending=ascending))
            assert np.array_equal(got, want_keys.view(kb.dtype)), (
                dtype, ascending)
            # positional stability within equal keys
            for run_val in np.unique(kb)[:3]:
                pos = idx[got == run_val]
                assert np.all(pos[:-1] < pos[1:]), (dtype, ascending)
