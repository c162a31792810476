"""Randomized differential fuzz for the operator set: group_aggregate,
inner_join_expand, top_k, and unique against plain-NumPy models on random
(dtype, cardinality, size) workloads.  Seeds are fixed — failures
reproduce exactly.  Ops run eagerly (no jit) so random shapes don't pay
a compile each; the jitted paths are covered by the deterministic tests.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simd_radix_sort_tpu.ops import hashagg, hashjoin, topk

KEY_DTYPES = [np.int8, np.uint16, np.int32, np.uint32, np.int64, np.uint64,
              np.float32, np.float64]
VAL_DTYPES = [np.int32, np.uint32, np.int64, np.float32]
AGG_SETS = [("sum",), ("count",), ("min", "max"), ("sum", "count", "mean"),
            ("max", "sum", "min", "count", "mean")]


def _rand_keys(rng, dtype, n, card):
    base = rng.integers(0, card, n)
    if np.dtype(dtype).kind == "f":
        # include negatives and repeated exact values (bit-distinct groups)
        return ((base - card // 2) * 0.5).astype(dtype)
    info = np.iinfo(dtype)
    lo = max(info.min, -(card // 2)) if info.min < 0 else 0
    return (base + lo).astype(dtype)


def _np_groups(keys):
    order = np.argsort(keys, kind="stable")
    uniq, starts = np.unique(keys[order], return_index=True)
    return order, uniq, starts


@pytest.mark.parametrize("trial", range(12))
def test_group_aggregate_fuzz(trial):
    rng = np.random.default_rng(7000 + trial)
    kdt = KEY_DTYPES[rng.integers(len(KEY_DTYPES))]
    vdt = VAL_DTYPES[rng.integers(len(VAL_DTYPES))]
    aggs = AGG_SETS[rng.integers(len(AGG_SETS))]
    n = int(rng.integers(1, 5000))
    card = int(rng.integers(1, 300))
    keys = _rand_keys(rng, kdt, n, card)
    if np.dtype(vdt).kind == "f":
        vals = rng.normal(0, 100, n).astype(vdt)
    else:
        vals = rng.integers(1, 1000, n).astype(vdt)

    ng, gk, results = hashagg.group_aggregate(jnp.asarray(keys),
                                              jnp.asarray(vals), aggs=aggs)
    ng = int(ng)
    order, uniq, starts = _np_groups(keys)
    vs = vals[order]
    groups = np.split(vs, starts[1:])
    assert ng == len(uniq), (trial, kdt, aggs)
    assert np.array_equal(np.asarray(gk)[:ng], uniq)

    for agg, res in zip(aggs, results):
        if agg == "count":
            assert np.array_equal(np.asarray(res)[:ng],
                                  [len(g) for g in groups]), (trial, agg)
            continue
        got = np.asarray(res[0])[:ng]
        if agg == "sum":
            want = np.array([g.sum(dtype=np.float64 if vdt == np.float32
                                   else None) for g in groups])
            if np.dtype(vdt).kind == "f":
                np.testing.assert_allclose(got, want, rtol=1e-4)
            else:
                assert np.array_equal(got, np.array(want).astype(vdt))
        elif agg == "mean":
            if np.dtype(vdt).kind == "f":
                want = [g.astype(np.float64).mean() for g in groups]
                np.testing.assert_allclose(got, want, rtol=1e-4)
            else:
                want = [int(g.astype(np.int64).sum()) // len(g)
                        for g in groups]
                assert np.array_equal(got.astype(np.int64), want), (
                    trial, agg)
        else:
            op = np.min if agg == "min" else np.max
            assert np.array_equal(got, [op(g) for g in groups]), (trial, agg)


@pytest.mark.parametrize("trial", range(8))
def test_inner_join_fuzz(trial):
    rng = np.random.default_rng(8000 + trial)
    kdt = [np.int32, np.uint64, np.int64][rng.integers(3)]
    np_ = int(rng.integers(1, 2000))
    nb = int(rng.integers(1, 800))
    card = int(rng.integers(1, 200))
    probe_k = _rand_keys(rng, kdt, np_, card)
    build_k = _rand_keys(rng, kdt, nb, card)
    probe_v = rng.integers(0, 2**31, np_).astype(np.int32)
    build_v = rng.integers(0, 2**31, nb).astype(np.int32)

    want = sorted(
        (int(pk), int(pv), int(bv))
        for pk, pv in zip(probe_k, probe_v)
        for bk, bv in zip(build_k, build_v) if pk == bk)

    cap = max(len(want), 1)
    total, pidx, pk, (pv,), (bv,) = hashjoin.inner_join_expand(
        jnp.asarray(probe_k), (jnp.asarray(probe_v),),
        jnp.asarray(build_k), (jnp.asarray(build_v),), capacity=cap)
    total = int(total)
    assert total == len(want), (trial, kdt, card)
    got = sorted(zip(np.asarray(pk)[:total].astype(np.int64).tolist(),
                     np.asarray(pv)[:total].tolist(),
                     np.asarray(bv)[:total].tolist()))
    assert got == want, (trial, kdt, card)


@pytest.mark.parametrize("trial", range(8))
def test_topk_unique_fuzz(trial):
    rng = np.random.default_rng(9000 + trial)
    kdt = [np.int16, np.uint32, np.int64, np.float32][rng.integers(4)]
    n = int(rng.integers(1, 30_000))
    card = int(rng.integers(1, 500))
    keys = _rand_keys(rng, kdt, n, card)
    pay = rng.integers(0, 2**31, n).astype(np.uint32)
    k = int(rng.integers(1, n + 1))
    largest = bool(rng.integers(2))

    kk, pp = topk.top_k(jnp.asarray(keys), jnp.asarray(pay), k=k,
                        largest=largest)
    # order-inverter that cannot overflow: bitwise NOT for ints (strictly
    # order-reversing in both unsigned and two's-complement), negation
    # for floats
    inv = ((lambda v: -v) if np.dtype(kdt).kind == "f" else (lambda v: ~v))
    order = sorted(range(n), key=lambda i: (inv(keys[i]) if largest
                                            else keys[i], i))
    idx = np.array(order[:k])
    assert np.array_equal(np.asarray(kk), keys[idx]), (trial, kdt, k)
    assert np.array_equal(np.asarray(pp), pay[idx]), (trial, kdt, k)

    cnt, ku, mult = topk.unique(jnp.asarray(keys))
    c = int(cnt)
    uniq, counts = np.unique(keys, return_counts=True)
    assert c == len(uniq)
    assert np.array_equal(np.asarray(ku)[:c], uniq)
    assert np.array_equal(np.asarray(mult)[:c], counts)
