"""Quicksort family (ops/quick_sort.py): the pivot-partition primitive and
the reference-semantics recursion model (quick_sort.hpp parity)."""

import numpy as np
import pytest
import jax.numpy as jnp

import simd_radix_sort_tpu as srs
from simd_radix_sort_tpu.ops import quick_sort
from simd_radix_sort_tpu.utils import data as D
from simd_radix_sort_tpu.utils import transforms


@pytest.mark.parametrize("dtype", [np.uint32, np.int32, np.float32,
                                   np.uint64, np.int8])
@pytest.mark.parametrize("ascending", [True, False])
def test_partition_device(dtype, ascending):
    keys = D.make_keys(4096, dtype, D.Distribution.UNIFORM, seed=2)
    (pay,) = D.make_payloads(keys, [np.uint32], "fast")
    pivot = keys[17]
    k, (p,), split, kmin, kmax = quick_sort.partition(
        jnp.asarray(keys), (jnp.asarray(pay),), pivot, ascending=ascending)
    k, p, split = np.asarray(k), np.asarray(p), int(split)

    u = transforms.to_sortable_np(keys, ascending)
    up = transforms.to_sortable_np(np.array([pivot], dtype))[0] \
        if ascending else \
        transforms.to_sortable_np(np.array([pivot], dtype), False)[0]
    uk = transforms.to_sortable_np(k, ascending)
    le = u <= up
    assert split == int(le.sum())
    assert np.all(uk[:split] <= up)
    assert np.all(uk[split:] > up)
    # stability: left/right sides keep input order (stronger than reference)
    order = np.argsort(~le, kind="stable")
    assert np.array_equal(k, keys[order])
    assert np.array_equal(p, pay[order])
    # min/max are the true extremes in the requested order
    assert np.asarray(kmin) == k[np.argmin(uk)]
    assert np.asarray(kmax) == k[np.argmax(uk)]


@pytest.mark.parametrize("dtype", [np.int32, np.float32, np.uint64])
@pytest.mark.parametrize("dist", [D.Distribution.UNIFORM, D.Distribution.ZERO,
                                  D.Distribution.ZERO_ONE,
                                  D.Distribution.SORTED,
                                  D.Distribution.REVERSE_SORTED])
@pytest.mark.parametrize("method", ["quick", "quickseq"])
def test_quick_method_matrix(dtype, dist, method):
    """Device engine and host model across distributions; for quickseq the
    constant-range pruning must kill the O(n^2) constant-input pathology
    (quick_sort.hpp:321-330), so Zero/ZeroOne run fast here."""
    keys = D.make_keys(20_000, dtype, dist, seed=4)
    (pay,) = D.make_payloads(keys, [np.uint64], "fast")
    k, p = srs.sort(keys, pay, method=method)
    assert D.check_data(np.asarray(k), (np.asarray(p),), keys) == ""


def test_quick_descending_with_payload():
    keys = D.make_keys(5_000, np.int16, D.Distribution.GAUSSIAN, seed=6)
    (pay,) = D.make_payloads(keys, [np.uint8], "fast")
    k, p = srs.sort(keys, pay, ascending=False, method="quick")
    assert D.check_data(np.asarray(k), (np.asarray(p),), keys,
                        ascending=False) == ""
    k, p = srs.sort(keys, pay, ascending=False, method="quickseq")
    assert D.check_data(np.asarray(k), (np.asarray(p),), keys,
                        ascending=False) == ""


@pytest.mark.parametrize("n", [0, 1, 2, 15, 16, 17])
@pytest.mark.parametrize("method", ["quick", "quickseq"])
def test_quick_tiny(n, method):
    keys = D.make_keys(n, np.uint8, D.Distribution.UNIFORM, seed=8)
    out = srs.sort(keys, method=method)
    assert np.array_equal(np.asarray(out), np.sort(keys))


def test_median_of_9_reference_positions():
    """getMedianOf9 (quick_sort.hpp:285-294) spec check: thirds boundaries
    with per-subinterval midpoints, NOT evenly spaced eighths."""
    from simd_radix_sort_tpu.ops.quick_sort import _median_of_9

    rng = np.random.default_rng(7)
    for _ in range(200):
        left = int(rng.integers(0, 50))
        right = left + int(rng.integers(16, 400))
        u = rng.integers(0, 2**32, right + 8, dtype=np.uint64)

        def med(a, b, c):
            return sorted([a, b, c])[1]

        def med3(l, r):
            return med(u[l], u[l + (r - l) // 2], u[r])

        lm = left + (right - left) // 3
        rm = left + 2 * (right - left) // 3
        want = med(med3(left, lm), med3(lm + 1, rm), med3(rm + 1, right))
        assert _median_of_9(u, left, right) == want


def test_quick_workstack_deep_segments():
    """Adversarial input that defeats both pivot strategies must not blow a
    recursion limit (work-stack driver)."""
    from simd_radix_sort_tpu.ops import quick_sort

    # geometric cascade: every avg-pivot splits off a tiny left piece
    n = 4096
    u = (np.uint64(1) << np.arange(n, dtype=np.uint64) % 63)
    rng = np.random.default_rng(3)
    rng.shuffle(u)
    out = quick_sort.sort_np(u.view(np.int64), threshold=2)[0]
    assert np.array_equal(out, np.sort(u.view(np.int64)))


def test_out_of_range_skips_partition(monkeypatch):
    """Beyond c * BLOCK/2 rows the blocked cleanup can never engage, so
    the engine must emit ONE sort (no wasted partition pass) — the
    round-3 partition-attack conclusion (scripts/partition_attack.py:
    the bucket-id mover is itself a lax.sort and cannot win)."""
    import jax

    monkeypatch.setattr(quick_sort, "MAX_BUCKETS", 4)
    monkeypatch.setattr(quick_sort, "BLOCK", 256)

    def n_sorts(n):
        keys = D.make_keys(n, np.uint32, D.Distribution.UNIFORM, seed=3)
        txt = jax.jit(
            lambda k: quick_sort.sort_arrays(k, block_threshold=64)
        ).lower(jnp.asarray(keys)).as_text()
        out, _ = quick_sort.sort_arrays(jnp.asarray(keys),
                                        block_threshold=64)
        assert np.array_equal(np.asarray(out), np.sort(keys))
        return txt.count("stablehlo.sort")

    # n > 4 * 128: partition pointless -> exactly one sort in the program
    assert n_sorts(1000) == 1
    # in-range n: partition + cleanup phases (+ splitter sample sort)
    assert n_sorts(400) >= 3
