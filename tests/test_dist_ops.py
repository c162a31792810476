"""Distributed operators on the 8-device virtual mesh."""

import numpy as np
import pytest

from simd_radix_sort_tpu.parallel import dist_ops, dist_sort


def test_distributed_filter():
    rng = np.random.default_rng(31)
    keys = rng.integers(0, 1000, 8 * 512, dtype=np.int32)
    pay = rng.integers(0, 2**32, 8 * 512, dtype=np.uint32)
    counts, k_out, (p_out,) = dist_ops.distributed_filter(
        lambda k: k < 100, keys, pay)
    got_k, (got_p,) = dist_ops.gather_filtered(counts, k_out, (p_out,))
    mask = keys < 100
    assert np.array_equal(got_k, keys[mask])
    assert np.array_equal(got_p, pay[mask])


@pytest.mark.parametrize("agg,combine", [
    ("sum", lambda v: v.sum()),
    ("count", lambda v: len(v)),
    ("min", lambda v: v.min()),
    ("max", lambda v: v.max()),
])
def test_distributed_group_aggregate(agg, combine):
    rng = np.random.default_rng(32)
    keys = rng.integers(0, 50, 8 * 256, dtype=np.int32)
    vals = rng.integers(1, 1000, 8 * 256, dtype=np.int32)
    ng, gk, res = dist_ops.distributed_group_aggregate(keys, vals, agg=agg)
    uniq = np.unique(keys)
    assert ng == len(uniq)
    assert np.array_equal(gk, uniq)
    want = np.array([combine(vals[keys == u]) for u in uniq])
    assert np.array_equal(res, want), (res[:5], want[:5])


def test_distributed_group_aggregate_mean():
    rng = np.random.default_rng(33)
    keys = rng.integers(0, 20, 8 * 128, dtype=np.int32)
    vals = rng.integers(0, 100, 8 * 128, dtype=np.int32)
    ng, gk, res = dist_ops.distributed_group_aggregate(keys, vals, agg="mean")
    uniq = np.unique(keys)
    want = np.array([vals[keys == u].mean() for u in uniq])
    assert np.allclose(res, want)


def test_distributed_group_aggregate_multi_agg_one_exchange():
    """A tuple of aggregates computes all of them in one exchange with
    deduped partials (sum/mean/count share streams)."""
    rng = np.random.default_rng(34)
    keys = rng.integers(0, 40, 8 * 256, dtype=np.int32)
    vals = rng.integers(1, 1000, 8 * 256, dtype=np.int32)
    ng, gk, (s, c, mn, mx, mean) = dist_ops.distributed_group_aggregate(
        keys, vals, agg=("sum", "count", "min", "max", "mean"))
    uniq = np.unique(keys)
    assert ng == len(uniq)
    assert np.array_equal(gk, uniq)
    groups = [vals[keys == u] for u in uniq]
    assert np.array_equal(s, [g.sum() for g in groups])
    assert np.array_equal(c, [len(g) for g in groups])
    assert np.array_equal(mn, [g.min() for g in groups])
    assert np.array_equal(mx, [g.max() for g in groups])
    assert np.allclose(mean, [g.mean() for g in groups])


def test_distributed_top_k():
    rng = np.random.default_rng(55)
    keys = rng.integers(0, 2**31, 8 * 1024, dtype=np.int32)
    pay = keys * np.int32(2) + np.int32(1)
    kk, pp = dist_ops.distributed_top_k(keys, pay, k=13)
    order = np.argsort(-keys, kind="stable")[:13]
    assert np.array_equal(kk, keys[order])
    assert np.array_equal(pp, pay[order])
    (ks,) = dist_ops.distributed_top_k(keys, k=5, largest=False)
    assert np.array_equal(ks, np.sort(keys)[:5])


def test_distributed_aggregate_validity_no_sentinel():
    """Groups present on only ONE shard must survive the combine (their
    partial rows collide with padding on every other shard), and values in
    the old sentinel range (>= 2**30) must aggregate exactly — the validity
    bit is an explicit stream, not an in-band magic value."""
    rng = np.random.default_rng(34)
    n = 8 * 256
    # skewed keys: key g lives only on shard g (first 8 groups), plus a
    # common key 99 everywhere
    shard = np.arange(n) // 256
    keys = np.where(np.arange(n) % 2 == 0, shard, 99).astype(np.int32)
    vals = rng.integers(2**30, 2**31 - 1, n, dtype=np.int64)
    for agg, combine in [("sum", lambda v: v.sum()),
                         ("max", lambda v: v.max()),
                         ("min", lambda v: v.min()),
                         ("count", lambda v: np.int64(len(v)))]:
        ng, gk, res = dist_ops.distributed_group_aggregate(keys, vals,
                                                           agg=agg)
        uniq = np.unique(keys)
        assert ng == len(uniq)
        assert np.array_equal(gk, uniq)
        want = np.array([combine(vals[keys == u]) for u in uniq])
        assert np.array_equal(np.asarray(res, dtype=np.int64), want), agg


def test_distributed_aggregate_many_groups():
    """Distinct keys ~ 2 * n/P: impossible under the old replicated
    all_gather phase (groups had to fit one shard); the key-range exchange
    of partials shards the group table instead (round-2 VERDICT item 6)."""
    rng = np.random.default_rng(35)
    n = 8 * 256
    n_groups = 2 * (n // 8)  # 512 distinct keys, 64 per shard capacity
    keys = rng.integers(0, n_groups, n).astype(np.int32)
    vals = rng.integers(1, 1000, n).astype(np.int64)
    ng, gk, res = dist_ops.distributed_group_aggregate(keys, vals, agg="sum")
    uniq = np.unique(keys)
    assert ng == len(uniq) > n // 8  # more groups than one shard holds
    assert np.array_equal(gk, uniq)
    want = np.array([vals[keys == u].sum() for u in uniq])
    assert np.array_equal(np.asarray(res, np.int64), want)


def test_distributed_aggregate_count_heavy():
    """Count-dominated workload: one giant group + many singletons."""
    n = 8 * 512
    keys = np.zeros(n, dtype=np.int32)
    keys[::64] = np.arange(n // 64, dtype=np.int32) + 1
    vals = np.ones(n, dtype=np.int32)
    ng, gk, res = dist_ops.distributed_group_aggregate(keys, vals,
                                                       agg="count")
    uniq, want = np.unique(keys, return_counts=True)
    assert ng == len(uniq)
    assert np.array_equal(gk, uniq)
    assert np.array_equal(np.asarray(res), want)


def _np_inner_join(pk, pp, bk, bp):
    """Oracle: all (probe, build) matching pairs as a sorted multiset."""
    out = []
    bidx = {}
    for i, k in enumerate(bk):
        bidx.setdefault(k, []).append(i)
    for i, k in enumerate(pk):
        for j in bidx.get(k, ()):
            out.append((k, pp[i], bp[j]))
    return sorted(out)


@pytest.mark.parametrize("dtype", [np.uint32, np.int32, np.uint64])
def test_distributed_join(dtype):
    rng = np.random.default_rng(40)
    n_p, n_b = 8 * 256, 8 * 128
    pk = rng.integers(0, 300, n_p).astype(dtype)
    bk = rng.integers(0, 300, n_b).astype(dtype)
    pp = rng.integers(0, 2**31, n_p, dtype=np.int32)
    bp = rng.integers(0, 2**63, n_b, dtype=np.uint64)
    # ~23 expected matches per probe key -> ~900 output rows per device;
    # size the static output capacity above that
    counts, k_out, opp, obp, ov, meta = dist_ops.distributed_join(
        pk, (pp,), bk, (bp,), out_rows_per_device=4096)
    assert not np.asarray(ov).any()
    gk, (gpp,), (gbp,) = dist_ops.gather_joined(counts, k_out, opp, obp)
    got = sorted(zip(gk.tolist(), gpp.tolist(), gbp.tolist()))
    want = _np_inner_join(pk.tolist(), pp.tolist(), bk.tolist(), bp.tolist())
    assert got == want


def test_distributed_join_skewed_keys():
    """One hot key on both sides: all its pairs must still meet (equal
    keys co-locate) and the output capacity overflow must be flagged when
    exceeded."""
    rng = np.random.default_rng(41)
    n = 8 * 64
    pk = np.where(np.arange(n) % 4 == 0, 7, rng.integers(100, 200, n))
    bk = np.where(np.arange(n) % 8 == 0, 7, rng.integers(100, 200, n))
    pk, bk = pk.astype(np.int32), bk.astype(np.int32)
    pp = np.arange(n, dtype=np.int32)
    bp = np.arange(n, dtype=np.int32) * 2
    # key 7 alone produces (n/4)*(n/8) = 8192 pairs, all on ONE device
    counts, k_out, opp, obp, ov, meta = dist_ops.distributed_join(
        pk, (pp,), bk, (bp,), capacity_factor=8.0,
        out_rows_per_device=16384)
    assert not np.asarray(ov).any()
    gk, (gpp,), (gbp,) = dist_ops.gather_joined(counts, k_out, opp, obp)
    got = sorted(zip(gk.tolist(), gpp.tolist(), gbp.tolist()))
    want = _np_inner_join(pk.tolist(), pp.tolist(), bk.tolist(), bp.tolist())
    assert got == want
    # tiny output capacity must flag overflow
    _, _, _, _, ov2, _ = dist_ops.distributed_join(
        pk, (pp,), bk, (bp,), capacity_factor=8.0, out_rows_per_device=4)
    assert np.asarray(ov2).any()


def test_distributed_join_zipf_heavy_hitters():
    """North-star config 5: Zipf-skewed keys with skew repartitioning.
    The hottest key alone exceeds any per-device receive buffer at
    capacity_factor 2 (equal keys must co-locate), so the broadcast-join
    hot path must carry it — and disabling the hot path must overflow."""
    rng = np.random.default_rng(44)
    n_p, n_b = 8 * 256, 8 * 128
    pk = np.minimum(rng.zipf(1.3, n_p), 2**31 - 1).astype(np.uint32)
    bk = np.minimum(rng.zipf(1.3, n_b), 2**31 - 1).astype(np.uint32)
    pp = np.arange(n_p, dtype=np.int32)
    bp = np.arange(n_b, dtype=np.int32) * 2
    counts, k_out, opp, obp, ov, meta = dist_ops.distributed_join(
        pk, (pp,), bk, (bp,), capacity_factor=2.0,
        out_rows_per_device=1 << 16)
    assert not np.asarray(ov).any()
    gk, (gpp,), (gbp,) = dist_ops.gather_joined(counts, k_out, opp, obp)
    got = sorted(zip(gk.tolist(), gpp.tolist(), gbp.tolist()))
    want = _np_inner_join(pk.tolist(), pp.tolist(), bk.tolist(), bp.tolist())
    assert got == want
    # without the hot path the same workload overflows a receive buffer
    _, _, _, _, ov0, _ = dist_ops.distributed_join(
        pk, (pp,), bk, (bp,), capacity_factor=2.0,
        out_rows_per_device=1 << 16, hot_keys=0)
    assert np.asarray(ov0).any()


def test_distributed_join_all_rows_one_key():
    """Degenerate broadcast-join case: every row shares one key."""
    n_p, n_b = 8 * 64, 8 * 32
    pk = np.full(n_p, 123, np.uint32)
    bk = np.full(n_b, 123, np.uint32)
    pp = np.arange(n_p, dtype=np.int32)
    bp = np.arange(n_b, dtype=np.int32)
    counts, k_out, opp, obp, ov, meta = dist_ops.distributed_join(
        pk, (pp,), bk, (bp,), capacity_factor=2.0,
        out_rows_per_device=n_p * n_b // 8 + n_b)
    assert not np.asarray(ov).any()
    gk, (gpp,), (gbp,) = dist_ops.gather_joined(counts, k_out, opp, obp)
    assert len(gk) == n_p * n_b
    got = sorted(zip(gk.tolist(), gpp.tolist(), gbp.tolist()))
    want = _np_inner_join(pk.tolist(), pp.tolist(), bk.tolist(), bp.tolist())
    assert got == want


def test_distributed_join_no_matches():
    pk = np.arange(8 * 32, dtype=np.uint32)
    bk = pk + 1_000_000
    counts, k_out, opp, obp, ov, meta = dist_ops.distributed_join(
        pk, (), bk, ())
    assert not np.asarray(ov).any()
    assert int(np.asarray(counts).sum()) == 0


def test_distributed_join_float64_keys():
    """f64 keys cross the device boundary as u64 bits and come back as
    float64 via meta (the lossy-TPU protocol; exact on the CPU mesh too)."""
    rng = np.random.default_rng(42)
    n = 8 * 64
    pool = np.concatenate([rng.normal(0, 10, 38),
                           [1e300, -0.0]]).astype(np.float64)
    pk = rng.choice(pool, n)
    bk = rng.choice(pool[:20], n // 2)
    pp = np.arange(n, dtype=np.int32)
    bp = np.arange(n // 2, dtype=np.int32)
    counts, k_out, opp, obp, ov, meta = dist_ops.distributed_join(
        pk, (pp,), bk, (bp,), capacity_factor=4.0,
        out_rows_per_device=16384)
    assert not np.asarray(ov).any()
    gk, (gpp,), (gbp,) = dist_ops.gather_joined(counts, k_out, opp, obp,
                                                meta)
    assert gk.dtype == np.float64
    got = sorted(zip(gk.view(np.uint64).tolist(), gpp.tolist(),
                     gbp.tolist()))
    want = sorted((np.array(k, np.float64).view(np.uint64).item(),
                   int(pp[i]), int(bp[j]))
                  for i, k in enumerate(pk)
                  for j, kb in enumerate(bk)
                  if np.array(kb, np.float64).view(np.uint64)
                  == np.array(k, np.float64).view(np.uint64))
    assert got == want


def test_group_aggregate_f64_bits_staging(monkeypatch):
    """f64 keys with negatives through the TPU bits-staging path: both
    grouping phases must run on the TRANSFORMED carrier, not the raw u64
    bits (negative doubles sort ABOVE positives in bit order, so raw-bit
    grouping misroutes partials across the key-range exchange and
    returns duplicate groups with wrong sums — round-3 review)."""
    real = dist_sort.stage_host_bits

    def force(x):
        x = np.asarray(x)
        if x.dtype == np.float64:
            return x.view(np.uint64), np.dtype(np.float64)
        return real(x)

    monkeypatch.setattr(dist_sort, "stage_host_bits", force)
    rng = np.random.default_rng(11)
    keys = rng.normal(0, 10, 8 * 256).round(1)  # dups, ~half negative,
    vals = rng.integers(0, 100, 8 * 256).astype(np.int64)  # incl. -0.0
    ng, gk, sums = dist_ops.distributed_group_aggregate(keys, vals, "sum")
    # expected: totalOrder grouping — distinct BIT patterns (-0.0 is its
    # own group), ordered by the sign-magnitude carrier (float order with
    # -0.0 immediately below +0.0) — identical to the unstaged path
    bits = keys.view(np.uint64)
    ub, inv = np.unique(bits, return_inverse=True)
    want = np.zeros(len(ub), dtype=np.int64)
    np.add.at(want, inv, vals)
    sbit = np.uint64(1) << np.uint64(63)
    car = np.where(ub & sbit, ~ub, ub | sbit)
    order = np.argsort(car)
    assert ng == len(ub)
    assert np.array_equal(gk[:ng].view(np.uint64), ub[order])
    assert np.array_equal(np.asarray(sums[:ng]), want[order])
    # and the unstaged (CPU-native f64) path agrees exactly
    monkeypatch.setattr(dist_sort, "stage_host_bits", real)
    ng2, gk2, sums2 = dist_ops.distributed_group_aggregate(
        keys, vals, "sum")
    assert ng2 == ng
    assert np.array_equal(np.asarray(gk2[:ng]).view(np.uint64),
                          gk[:ng].view(np.uint64))
    assert np.array_equal(np.asarray(sums2[:ng]), np.asarray(sums[:ng]))


def test_distributed_unique():
    rng = np.random.default_rng(12)
    keys = rng.integers(-40, 40, 8 * 256, dtype=np.int32)
    ng, gk, counts = dist_ops.distributed_unique(keys)
    uk, uc = np.unique(keys, return_counts=True)
    assert ng == len(uk)
    assert np.array_equal(gk[:ng], uk)
    assert np.array_equal(np.asarray(counts[:ng]), uc)


def test_distributed_join_hot_on_smaller_table():
    """A key hot on only ONE side of a size-asymmetric join (50% of the
    probe table; build 16x larger) must still take the broadcast path:
    pooled-sample detection diluted its frequency below any fixed bar
    and overflowed the receive buffer (round-3 review, verified repro).
    Detection is per table now."""
    rng = np.random.default_rng(45)
    n_p, n_b = 8 * 128, 8 * 2048
    pk = rng.integers(0, 1 << 20, n_p).astype(np.uint32)
    pk[rng.random(n_p) < 0.5] = np.uint32(777)
    bk = rng.integers(0, 1 << 20, n_b).astype(np.uint32)
    bk[:8] = np.uint32(777)
    pp = np.arange(n_p, dtype=np.int32)
    bp = np.arange(n_b, dtype=np.int32)
    counts, k_out, opp, obp, ov, meta = dist_ops.distributed_join(
        pk, (pp,), bk, (bp,), capacity_factor=2.0,
        out_rows_per_device=1 << 16)
    assert not np.asarray(ov).any()
    gk, (gpp,), (gbp,) = dist_ops.gather_joined(counts, k_out, opp, obp)
    got = sorted(zip(gk.tolist(), gpp.tolist(), gbp.tolist()))
    want = _np_inner_join(pk.tolist(), pp.tolist(), bk.tolist(),
                          bp.tolist())
    assert got == want


def test_top_k_filter_64bit_guards():
    """int64 streams with x64 off must raise, not silently truncate to
    their low 32 bits (round-3 review, confirmed repro: top_k returned
    the wrong rows and filter evaluated the predicate on corrupted
    values)."""
    import jax

    big = np.arange(2**40, 2**40 + 16, dtype=np.int64)
    with jax.enable_x64(False):
        with pytest.raises(ValueError, match="64-bit"):
            dist_ops.distributed_top_k(big, k=4)
        with pytest.raises(ValueError, match="64-bit"):
            dist_ops.distributed_filter(lambda k: k > 7, big)
    # with x64 on, the staged path returns the true rows
    kk, = dist_ops.distributed_top_k(big, k=4)
    assert np.array_equal(kk, big[::-1][:4])


def test_top_k_f64_keys():
    """f64 keys ride the bits-staging protocol with float ORDER (not bit
    order) and come back as float64."""
    rng = np.random.default_rng(13)
    keys = rng.normal(0, 10, 8 * 64)
    pay = np.arange(8 * 64, dtype=np.int32)
    kk, pp = dist_ops.distributed_top_k(keys, pay, k=5)
    order = np.argsort(-keys, kind="stable")[:5]
    assert kk.dtype == np.float64
    assert np.array_equal(kk, keys[order])
    assert np.array_equal(pp, pay[order])


def test_empty_tables():
    """0-row inputs degrade gracefully instead of crashing in the
    splitter sampler (round-3 review, confirmed repro)."""
    ek = np.zeros(0, np.uint32)
    ep = np.zeros(0, np.int32)
    out_k, out_p, counts, ov, meta = dist_sort.distributed_sort(ek, ep)
    gk, gp = dist_sort.gather_result(out_k, out_p, counts, meta)
    assert gk.shape == (0,) and not np.asarray(ov).any()
    # empty build side: join result is empty
    pk = np.arange(8 * 16, dtype=np.uint32)
    counts, k_out, opp, obp, ov, meta = dist_ops.distributed_join(
        pk, (pk,), ek, (ep,), out_rows_per_device=64)
    assert not np.asarray(ov).any()
    assert int(np.asarray(counts).sum()) == 0
    ng, gk2, cnts = dist_ops.distributed_unique(ek)
    assert ng == 0
    # both tables empty
    counts, k_out, opp, obp, ov, meta = dist_ops.distributed_join(
        ek, (ep,), ek, (ep,), out_rows_per_device=16)
    assert int(np.asarray(counts).sum()) == 0 and not np.asarray(ov).any()


def test_aggregate_entry_error_paths():
    """stage_aggregate_inputs guards shared by flat + hierarchical entries."""
    import pytest
    keys = np.arange(8 * 16, dtype=np.int32)
    vals = np.ones(8 * 16, dtype=np.int32)
    with pytest.raises(ValueError, match="empty agg tuple"):
        dist_ops.distributed_group_aggregate(keys, vals, agg=())
    with pytest.raises(ValueError, match="unsupported aggregate"):
        dist_ops.distributed_group_aggregate(keys, vals, agg="median")
    with pytest.raises(ValueError, match="unsupported aggregate"):
        dist_ops.distributed_group_aggregate(keys, vals,
                                             agg=("sum", "var"))
    with pytest.raises(ValueError, match="values length"):
        dist_ops.distributed_group_aggregate(keys, vals[:-1], agg="sum")
    with pytest.raises(ValueError, match="not divisible"):
        dist_ops.distributed_group_aggregate(keys[:-3], vals[:-3], agg="sum")
