"""Distributed sort tests on the virtual 8-device CPU mesh.

Validates the full multi-chip pipeline (local sort -> sampled splitters ->
all_to_all exchange -> merge) end to end against the NumPy model, including
duplicate-heavy distributions that exercise the tie-break balancing.
"""

import numpy as np
import pytest

import jax

from simd_radix_sort_tpu.parallel import dist_sort
from simd_radix_sort_tpu.utils import common
from simd_radix_sort_tpu.utils import data as D
from simd_radix_sort_tpu.utils import transforms


def _run(key_dtype, payload_dtypes, dist, n, ascending=True, num_devices=8,
         capacity_factor=2.0):
    mesh = dist_sort.make_mesh(num_devices)
    keys = D.make_keys(n, key_dtype, dist, seed=77)
    payloads = D.make_payloads(keys, payload_dtypes, "fast")
    out_k, out_p, counts, overflow, meta = dist_sort.distributed_sort(
        keys, *payloads, mesh=mesh, ascending=ascending,
        capacity_factor=capacity_factor)
    assert not bool(np.asarray(overflow).any()), "capacity overflow"
    got_k, got_p = dist_sort.gather_result(out_k, out_p, counts, meta)
    assert got_k.shape == keys.shape
    err = D.check_data(got_k, got_p, keys, ascending)
    assert err == "", err
    want = transforms.sort_np(keys, *payloads, ascending=ascending)
    assert np.array_equal(got_k.view(np.uint8), want[0].view(np.uint8))
    for a, b in zip(got_p, want[1:]):
        assert np.array_equal(np.asarray(a).view(np.uint8), b.view(np.uint8))


@pytest.mark.parametrize("key_dtype", [np.uint32, np.int32, np.float32,
                                       np.uint64, np.float64, np.uint8],
                         ids=common.type_name)
def test_distributed_uniform(key_dtype):
    _run(key_dtype, (np.uint32,), D.Distribution.UNIFORM, 8 * 1024)


def test_distributed_descending_payloads():
    _run(np.int64, (np.uint64, np.uint8), D.Distribution.GAUSSIAN,
         8 * 2048, ascending=False)


@pytest.mark.parametrize("dist", [D.Distribution.ZERO, D.Distribution.ZERO_ONE,
                                  D.Distribution.SORTED,
                                  D.Distribution.REVERSE_SORTED])
def test_distributed_skewed_small_keys(dist):
    """Duplicate-heavy / pre-sorted inputs: the <=32-bit tie-break must keep
    buckets balanced (capacity_factor stays small)."""
    _run(np.int32, (np.uint64,), dist, 8 * 1024, capacity_factor=1.5)


def test_distributed_two_devices():
    _run(np.uint32, (np.uint32,), D.Distribution.UNIFORM, 2 * 4096,
         num_devices=2)


def test_overflow_flag():
    """With capacity far below need and retries disabled, overflow must be
    reported."""
    mesh = dist_sort.make_mesh(8)
    keys = np.zeros(8 * 1024, dtype=np.uint64)
    out_k, out_p, counts, overflow, meta = dist_sort.distributed_sort(
        keys, mesh=mesh, capacity_factor=0.25, max_retries=0)
    assert bool(np.asarray(overflow).any())


def test_overflow_elastic_retry():
    """The same undersized capacity succeeds when retries may widen it."""
    mesh = dist_sort.make_mesh(8)
    rng = np.random.default_rng(9)
    keys = rng.integers(0, 2**32, 8 * 1024, dtype=np.uint32)
    out_k, out_p, counts, overflow, meta = dist_sort.distributed_sort(
        keys, mesh=mesh, capacity_factor=0.25, max_retries=3)
    assert not bool(np.asarray(overflow).any())
    got, _ = dist_sort.gather_result(out_k, out_p, counts, meta)
    assert np.array_equal(got, np.sort(keys))


@pytest.mark.parametrize("dist", [D.Distribution.ZERO, D.Distribution.ZERO_ONE])
def test_u64_duplicates_balanced(dist):
    """64-bit keys with massive duplication must stay load-balanced via the
    exact (hi, lo, pos) lexicographic tie-break — no overflow at a modest
    capacity factor."""
    _run(np.uint64, (np.uint64,), dist, 8 * 1024, capacity_factor=1.5)


def test_i64_sorted_input_balanced():
    _run(np.int64, (), D.Distribution.SORTED, 8 * 1024, capacity_factor=1.5)


def test_zipf_skew_balanced():
    """North-star skew case: heavy-tailed (Zipf) keys — the positional
    tie-break must keep buckets balanced despite extreme duplication."""
    rng = np.random.default_rng(44)
    keys = np.minimum(rng.zipf(1.3, 8 * 2048), 2**31 - 1).astype(np.uint32)
    (pay,) = D.make_payloads(keys, [np.uint32], "fast")
    out_k, out_p, counts, overflow, meta = dist_sort.distributed_sort(
        keys, pay, mesh=dist_sort.make_mesh(8), capacity_factor=1.5,
        max_retries=0)
    assert not bool(np.asarray(overflow).any())
    got_k, (got_p,) = dist_sort.gather_result(out_k, out_p, counts, meta)
    assert np.array_equal(got_k, np.sort(keys))
    assert D.check_data(got_k, (got_p,), keys) == ""
    # balance: no device holds more than 1.25x the mean
    c = np.asarray(counts)
    assert c.max() <= 1.25 * c.mean()


def test_f64_payload_bits_preserved():
    """float64 payloads must cross the 64-bit split/merge as BITS (a value
    cast truncates): negatives, fractions and NaN payloads survive."""
    rng = np.random.default_rng(66)
    keys = rng.integers(0, 2**32, 8 * 256, dtype=np.uint32)
    pay = rng.normal(0, 5, 8 * 256)
    pay[:7] = [np.nan, -np.inf, np.inf, -0.0, 1e-300, -2.75, 9.181]
    out_k, out_p, counts, overflow, meta = dist_sort.distributed_sort(
        keys, pay, mesh=dist_sort.make_mesh(8))
    got_k, (got_p,) = dist_sort.gather_result(out_k, out_p, counts, meta)
    order = np.argsort(keys, kind="stable")
    assert np.array_equal(got_k, keys[order])
    # same multiset of payload bits, and pairing preserved per key
    assert np.array_equal(np.sort(got_p.view(np.uint64)),
                          np.sort(pay.view(np.uint64)))
    m = {int(k): v for k, v in zip(keys.tolist(),
                                   pay.view(np.uint64).tolist())}
    for k, v in zip(got_k.tolist(), got_p.view(np.uint64).tolist()):
        assert m[int(k)] == v


def test_distributed_sort_multi_composite():
    """Distributed ORDER BY (c1 asc, c2 desc) across the mesh equals
    np.lexsort on the gathered table."""
    rng = np.random.default_rng(80)
    n = 8 * 512
    c1 = rng.integers(0, 30, n).astype(np.int32)
    c2 = rng.normal(0, 1, n).astype(np.float32)
    pay = np.arange(n, dtype=np.uint64)
    cols, pays, counts, ov, meta = dist_sort.distributed_sort_multi(
        (c1, c2), pay, ascending=(True, False))
    assert not np.asarray(ov).any()
    (g1, g2), (gp,) = dist_sort.gather_result_multi(cols, pays, counts,
                                                    meta)
    from simd_radix_sort_tpu.utils import transforms
    u2 = transforms.to_sortable_np(c2, False)
    order = np.lexsort((np.arange(n), u2, c1))
    assert np.array_equal(g1, c1[order])
    assert np.array_equal(g2, c2[order])
    # payload order within exactly-tied (c1, c2) rows is unspecified (the
    # merge sort is unstable): compare row TRIPLES as an exact multiset
    # (structured lexsort — no lossy hashing)
    def triples(a, b, p):
        rows = np.stack([a.astype(np.int64), b.view(np.uint32).astype(np.int64),
                         p.astype(np.int64)], axis=1)
        return rows[np.lexsort(rows.T[::-1])]
    assert np.array_equal(triples(g1, g2, gp), triples(c1, c2, pay))


def test_distributed_sort_multi_f64_and_duplicates():
    """f64 column via the bits protocol + a constant first column (every
    row ties on c1 — balance must come from the interleaved position)."""
    rng = np.random.default_rng(81)
    n = 8 * 256
    c1 = np.zeros(n, dtype=np.uint8)
    c2 = rng.choice(np.array([1.5, -2.25, 0.0, 3e200, -0.0], np.float64), n)
    cols, pays, counts, ov, meta = dist_sort.distributed_sort_multi(
        (c1, c2))
    assert not np.asarray(ov).any()
    (g1, g2), _ = dist_sort.gather_result_multi(cols, pays, counts, meta)
    assert g2.dtype == np.float64
    from simd_radix_sort_tpu.utils import transforms
    u2 = transforms.to_sortable_np(c2, True)
    assert np.array_equal(np.sort(u2), transforms.to_sortable_np(g2, True))
    # balanced: no device holds more than capacity_factor * n/P
    assert np.asarray(counts).max() <= 2 * (n // 8)


def test_distributed_sort_multi_elastic_retry():
    """A capacity factor too small for the skew must be recovered by the
    doubling retry (same protocol as the single-key sort)."""
    rng = np.random.default_rng(82)
    n = 8 * 256
    # heavy skew: 3/4 of rows share one (c1, c2) prefix
    c1 = np.where(rng.random(n) < 0.75, 7, rng.integers(0, 100, n))
    c1 = c1.astype(np.int32)
    c2 = rng.integers(0, 3, n).astype(np.uint8)
    cols, pays, counts, ov, meta = dist_sort.distributed_sort_multi(
        (c1, c2), capacity_factor=1.05, max_retries=3)
    assert not np.asarray(ov).any()  # retry absorbed the overflow
    (g1, g2), _ = dist_sort.gather_result_multi(cols, pays, counts, meta)
    order = np.lexsort((c2, c1))
    assert np.array_equal(g1, c1[order])
    assert np.array_equal(g2, c2[order])


def test_splitter_parts_validity_channel():
    """Samples from shards whose valid prefix is empty must not drag the
    pooled quantiles: devices 0-3 contribute ONLY invalid rows (value 5,
    the 'hot tail' stand-in) and the splitters must still land inside
    the valid data range [1000, 2000) (round-3 review)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = dist_sort.make_mesh(8)
    n_local = 64
    rows = []
    nvalids = []
    for d in range(8):
        nv = 0 if d < 4 else n_local
        nvalids.append(nv)
        r = np.full(n_local, 5, np.uint32)
        r[:nv] = np.sort(np.random.default_rng(d).integers(
            1000, 2000, nv).astype(np.uint32))
        rows.append(r)
    dom = np.concatenate(rows)
    nv_arr = np.asarray(nvalids, np.int32)

    def local(d, nv):
        spl = dist_sort.gather_splitters_parts(
            [((d,), nv[0])], "x", 7, 32)
        return (spl[0][None],)

    shard = jax.shard_map(
        local, mesh=mesh, in_specs=(P("x"), P("x")), out_specs=(P("x"),))
    out = jax.jit(shard)(
        jax.device_put(jnp.asarray(dom), NamedSharding(mesh, P("x"))),
        jax.device_put(jnp.asarray(nv_arr), NamedSharding(mesh, P("x"))))
    spl = np.asarray(out[0])[0]
    assert ((spl >= 1000) & (spl < 2000)).all(), spl


# ---------------------------------------------------------------------------
# blocked final mode (round 5): segment-aligned exchange + batched block sort
# ---------------------------------------------------------------------------

def _run_blocked(key_dtype, payload_dtypes, dist, n, num_devices=8,
                 capacity_factor=2.0, segments=4, ascending=True):
    import functools
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P_

    mesh = dist_sort.make_mesh(num_devices)
    keys = D.make_keys(n, key_dtype, dist, seed=99)
    payloads = D.make_payloads(keys, payload_dtypes, "fast")
    keys_s, kdt = dist_sort.stage_host_bits(keys)
    sharding = NamedSharding(mesh, P_("x"))
    kd = jax.device_put(jnp.asarray(keys_s), sharding)
    pd = tuple(jax.device_put(jnp.asarray(p), sharding) for p in payloads)
    fn = jax.jit(functools.partial(
        dist_sort.distributed_sort_sharded, mesh=mesh, ascending=ascending,
        capacity_factor=capacity_factor, key_dtype=kdt,
        final_mode="blocked", segments_per_device=segments))
    out_k, out_p, counts, overflow = fn(kd, pd)
    assert not bool(np.asarray(overflow).any()), "blocked capacity overflow"
    counts_h = np.asarray(counts)
    assert counts_h.shape == (num_devices * segments,)
    got_k, got_p = dist_sort.gather_result(
        np.asarray(out_k), tuple(np.asarray(p) for p in out_p), counts_h)
    if kdt is not None:
        got_k = got_k.view(kdt)
    assert got_k.shape == keys.shape
    err = D.check_data(got_k, got_p, keys, ascending)
    assert err == "", err
    want = transforms.sort_np(keys, *payloads, ascending=ascending)
    assert np.array_equal(got_k.view(np.uint8), want[0].view(np.uint8))


@pytest.mark.parametrize("key_dtype", [np.uint64, np.int32, np.float64],
                         ids=common.type_name)
def test_blocked_final_mode(key_dtype):
    _run_blocked(key_dtype, (np.uint64,), D.Distribution.UNIFORM, 8 * 2048)


def test_blocked_final_mode_duplicates_and_desc():
    # duplicate-heavy input exercises the fine-splitter tie-break; a
    # capacity factor of 2 must still hold every segment
    _run_blocked(np.int32, (np.uint32,), D.Distribution.ZERO_ONE, 8 * 1024,
                 segments=8)
    _run_blocked(np.uint32, (), D.Distribution.GAUSSIAN, 8 * 1024,
                 ascending=False, segments=2)


def test_blocked_final_mode_bad_mode_rejected():
    mesh = dist_sort.make_mesh(2)
    keys = D.make_keys(2 * 256, np.uint32, D.Distribution.UNIFORM, 1)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P_
    kd = jax.device_put(jnp.asarray(keys), NamedSharding(mesh, P_("x")))
    with pytest.raises(ValueError):
        dist_sort.distributed_sort_sharded(kd, (), mesh=mesh,
                                           final_mode="bogus")
