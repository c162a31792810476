"""Pallas compress-store partition (ops/pallas_partition.py) in interpreter
mode — the mask_compressstoreu role (/root/reference/src/simd.hpp:310-389)
and the 1-bit partition pass built on it (radix_sort.hpp:109-268).

Same hermetic pattern as test_pallas_hist.py: the kernel runs under the
Pallas interpreter on the CPU mesh; scripts/partition_bench.py measures the
real-TPU path."""

import numpy as np
import pytest
import jax.numpy as jnp

from simd_radix_sort_tpu.ops import pallas_partition as pp
from simd_radix_sort_tpu.ops import radix


def _np_partition(streams, mask):
    """Oracle: stable two-way partition of lock-step streams by mask."""
    order = np.argsort(mask, kind="stable")
    return [s[order] for s in streams]


@pytest.mark.parametrize("n", [1, 100, 128, 129, 512, 1300])
def test_partition_pass_matches_stable_oracle(n):
    rng = np.random.default_rng(n)
    streams = [rng.integers(0, 2**32, n, dtype=np.uint32) for _ in range(3)]
    mask = rng.integers(0, 2, n).astype(bool)
    got = pp.partition_pass([jnp.asarray(s) for s in streams],
                            jnp.asarray(mask), block=128, interpret=True)
    want = _np_partition(streams, mask)
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), w)


@pytest.mark.parametrize("fill", [False, True])
def test_partition_pass_degenerate_masks(fill):
    rng = np.random.default_rng(7)
    n = 300
    s = rng.integers(0, 2**32, n, dtype=np.uint32)
    mask = np.full(n, fill)
    (got,) = pp.partition_pass([jnp.asarray(s)], jnp.asarray(mask),
                               block=128, interpret=True)
    assert np.array_equal(np.asarray(got), s)  # order untouched either way


def test_partition_pass_is_stable_under_duplicates():
    n = 640
    s = np.arange(n, dtype=np.uint32)  # identity tags the input order
    mask = (np.arange(n) % 3 == 0)
    (got,) = pp.partition_pass([jnp.asarray(s)], jnp.asarray(mask),
                               block=128, interpret=True)
    want = _np_partition([s], mask)[0]
    assert np.array_equal(np.asarray(got), want)


def test_words_roundtrip():
    rng = np.random.default_rng(3)
    for dt in [np.uint8, np.int16, np.int32, np.float32, np.uint64, np.int64]:
        info = np.iinfo(dt) if np.issubdtype(dt, np.integer) else None
        a = (rng.integers(info.min, info.max, 50, dtype=dt) if info
             else rng.standard_normal(50).astype(dt))
        words, meta = pp.to_words(jnp.asarray(a))
        back = pp.from_words(words, meta)
        assert np.array_equal(np.asarray(back), a)


@pytest.mark.parametrize("dtype,asc", [
    (np.uint32, True), (np.int32, False), (np.float32, True),
    (np.uint8, True), (np.uint64, True),
])
def test_bitpart_engine_full_sort(dtype, asc):
    rng = np.random.default_rng(11)
    n = 700
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        keys = rng.integers(info.min, info.max, n, dtype=dtype)
    else:
        keys = rng.standard_normal(n).astype(dtype)
    pay = rng.integers(0, 2**31, n, dtype=np.int32)
    k_out, (p_out,) = radix.sort_arrays(
        jnp.asarray(keys), (jnp.asarray(pay),), ascending=asc,
        engine="pallas", interpret=True)
    np.testing.assert_array_equal(np.asarray(k_out),
                                  np.sort(keys)[:: 1 if asc else -1])
    # Stability: stable descending = keys grouped in reverse order but
    # input order preserved within each equal-key group.
    want = sorted(zip(keys.tolist(), pay.tolist(), range(n)),
                  key=lambda t: ((t[0] if asc else -t[0]), t[2]))
    got_pairs = list(zip(np.asarray(k_out).tolist(), np.asarray(p_out).tolist()))
    assert got_pairs == [(k, p) for k, p, _ in want]


def test_bitpart_engine_u64_payload():
    rng = np.random.default_rng(17)
    n = 513  # > one block, non-multiple
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    pay = rng.integers(0, 2**63, n, dtype=np.uint64)
    k_out, (p_out,) = radix.sort_arrays(
        jnp.asarray(keys), (jnp.asarray(pay),), ascending=True,
        engine="pallas", interpret=True)
    order = np.argsort(keys, kind="stable")
    assert np.array_equal(np.asarray(k_out), keys[order])
    assert np.array_equal(np.asarray(p_out), pay[order])
