"""Randomized differential fuzz for the mesh operators on the 8-device
virtual mesh: distributed_sort, distributed_group_aggregate (tuple agg),
and distributed_join against NumPy models.

Shapes are FIXED (one compile per dtype combo via cached_jit) — the fuzz
randomizes dtypes, key cardinality, and content, which is where the
splitter/capacity/heavy-hitter edge cases live.  Seeds are fixed.
"""

import numpy as np
import pytest

from simd_radix_sort_tpu.parallel import dist_ops, dist_sort

N = 8 * 512
KEY_DTYPES = [np.int32, np.uint32, np.int64, np.uint64, np.float32]


def _keys(rng, dtype, n, card):
    base = rng.integers(0, card, n)
    if np.dtype(dtype).kind == "f":
        return ((base - card // 2) * 0.25).astype(dtype)
    lo = -(card // 2) if np.dtype(dtype).kind == "i" else 0
    return (base + lo).astype(dtype)


@pytest.mark.parametrize("trial", range(6))
def test_distributed_sort_fuzz(trial):
    rng = np.random.default_rng(4000 + trial)
    kdt = KEY_DTYPES[rng.integers(len(KEY_DTYPES))]
    # cardinality spans heavy-duplicate to all-distinct regimes
    card = int(rng.integers(2, 3 * N))
    ascending = bool(rng.integers(2))
    keys = _keys(rng, kdt, N, card)
    pay = rng.integers(0, 2**63, N).astype(np.uint64)

    out_k, out_p, counts, ov, meta = dist_sort.distributed_sort(
        keys, pay, ascending=ascending)
    assert not np.asarray(ov).any(), (trial, kdt, card)
    got_k, (got_p,) = dist_sort.gather_result(out_k, out_p, counts, meta)

    # the sort (like the reference's) does not promise positional
    # stability within equal keys, so the oracle is tie-insensitive:
    # exact key sequence + exact key<->payload pairing as a multiset
    # (keys here contain no NaN/-0.0, so plain value order is total)
    want_k = np.sort(keys)
    if not ascending:
        want_k = want_k[::-1]
    assert np.array_equal(got_k, want_k), (trial, kdt, card, ascending)
    got_pairs = np.lexsort((got_p, got_k))
    want_pairs = np.lexsort((pay, keys))
    assert np.array_equal(got_p[got_pairs], pay[want_pairs]), (
        trial, kdt, card, ascending)
    assert np.array_equal(got_k[got_pairs], keys[want_pairs])


@pytest.mark.parametrize("trial", range(4))
def test_distributed_aggregate_fuzz(trial):
    rng = np.random.default_rng(4100 + trial)
    kdt = [np.int32, np.uint64][rng.integers(2)]
    card = int(rng.integers(2, 500))
    keys = _keys(rng, kdt, N, card)
    vals = rng.integers(1, 10_000, N).astype(np.int64)

    ng, gk, (s, c, mn) = dist_ops.distributed_group_aggregate(
        keys, vals, agg=("sum", "count", "min"))
    uniq = np.unique(keys)
    assert ng == len(uniq), (trial, kdt, card)
    assert np.array_equal(gk, uniq)
    groups = [vals[keys == u] for u in uniq]
    assert np.array_equal(s, [g.sum() for g in groups]), (trial, kdt, card)
    assert np.array_equal(c, [len(g) for g in groups])
    assert np.array_equal(mn, [g.min() for g in groups])


@pytest.mark.parametrize("trial", range(3))
def test_distributed_join_fuzz(trial):
    rng = np.random.default_rng(4200 + trial)
    kdt = [np.int32, np.int64][rng.integers(2)]
    card = int(rng.integers(8, 300))
    n_p, n_b = 8 * 256, 8 * 64
    probe_k = _keys(rng, kdt, n_p, card)
    build_k = _keys(rng, kdt, n_b, card)
    probe_v = rng.integers(0, 2**31, n_p).astype(np.uint32)
    build_v = rng.integers(0, 2**31, n_b).astype(np.uint32)

    want = sorted(
        (int(pk), int(pv), int(bv))
        for pk, pv in zip(probe_k, probe_v)
        for bk, bv in zip(build_k, build_v) if pk == bk)

    out_rows = max(64, 4 * (len(want) // 8 + 1))
    jc, jk, (ja,), (jb,), ov, jmeta = dist_ops.distributed_join(
        probe_k, (probe_v,), build_k, (build_v,),
        capacity_factor=4.0, out_rows_per_device=out_rows)
    assert not np.asarray(ov).any(), (trial, kdt, card, len(want))
    k_j, (pv_j,), (bv_j,) = dist_ops.gather_joined(jc, jk, (ja,), (jb,))
    got = sorted(zip(np.asarray(k_j).astype(np.int64).tolist(),
                     pv_j.tolist(), bv_j.tolist()))
    assert got == want, (trial, kdt, card, len(want))
