"""Counting / adaptive-range histogram sort (ops/counting.py).

Covers the keys-only scope where the reference's byte-radix competitors play
(IPPRadix: /root/reference/src/sort_methods.hpp:270-289): 1-byte dtypes via
fixed-K counting and 2/4-byte integers via adaptive range counting with a
comparison-sort fallback chosen at runtime inside jit.
"""

import numpy as np
import pytest

import simd_radix_sort_tpu as srs
from simd_radix_sort_tpu.utils import data as D
from simd_radix_sort_tpu.ops import counting


NARROW_DTYPES = [np.uint8, np.int8]
RANGE_DTYPES = [np.uint16, np.int16, np.uint32, np.int32]


@pytest.mark.parametrize("dtype", NARROW_DTYPES + RANGE_DTYPES)
@pytest.mark.parametrize("ascending", [True, False])
def test_counting_uniform(dtype, ascending):
    keys = D.make_keys(10_000, dtype, D.Distribution.UNIFORM, seed=11)
    out = np.asarray(srs.sort(keys, ascending=ascending, method="count"))
    want = np.sort(keys) if ascending else np.sort(keys)[::-1]
    assert np.array_equal(out, want)


@pytest.mark.parametrize("dtype", RANGE_DTYPES)
@pytest.mark.parametrize("dist", [D.Distribution.GAUSSIAN, D.Distribution.ZERO,
                                  D.Distribution.ZERO_ONE])
def test_counting_adaptive_small_range(dtype, dist):
    """Distributions whose carrier range is < K_MAX_RANGE take the counting
    branch of the lax.cond (Zero/ZeroOne always; Gaussian sigma=100 for ints,
    data.hpp:105-170 protocol)."""
    keys = D.make_keys(20_000, dtype, dist, seed=3)
    out = np.asarray(srs.sort(keys, method="count"))
    assert np.array_equal(out, np.sort(keys))


@pytest.mark.parametrize("n", [0, 1, 2, 255, 256, 4097])
def test_counting_edge_sizes(n):
    keys = D.make_keys(n, np.uint8, D.Distribution.UNIFORM, seed=7)
    out = np.asarray(srs.sort(keys, method="count"))
    assert np.array_equal(out, np.sort(keys))


def test_counting_rejects_payloads():
    keys = D.make_keys(100, np.uint8, D.Distribution.UNIFORM, seed=1)
    (pay,) = D.make_payloads(keys, [np.uint32], "fast")
    with pytest.raises(ValueError):
        srs.sort(keys, pay, method="count")


def test_auto_picks_count_for_narrow_keys_only():
    from simd_radix_sort_tpu import methods
    # measured crossovers (see methods.py constants + tests/test_auto_policy)
    assert methods.resolve("auto", np.uint8, (),
                           methods.COUNT_CROSSOVER_N_1BYTE).name == "count"
    assert methods.resolve("auto", np.int32, (),
                           methods.COUNT_MIN_N_ADAPTIVE).name == "count"
    # below the crossovers the comparison sort wins
    assert methods.resolve("auto", np.uint8, (), 1000).name == "xla"
    assert methods.resolve("auto", np.int32, (), 1 << 18).name == "xla"
    big = 1 << 26
    assert methods.resolve("auto", np.uint8, (np.uint32,), big).name == "xla"
    assert methods.resolve("auto", np.uint64, (), big).name == "xla"
    assert methods.resolve("auto", np.float32, (), big).name == "xla"


@pytest.mark.parametrize("k,n", [
    (256, 1000),        # u8 path, single chunk
    (256, 4096),        # exactly one chunk-floor boundary
    (1024, 5000),       # adaptive-range K
    (65536, 262145),    # chunk = 2^25/256 = 131072: 2 full chunks + 1 row
])
def test_mxu_histogram_matches_bincount(k, n):
    # mxu_histogram is pure jnp, so the MXU math (bf16 one-hot einsum,
    # hi/lo factorization, chunk loop) is exercised on the CPU CI suite
    # too (round-2 ADVICE item)
    rng = np.random.default_rng(k + n)
    v = rng.integers(0, k, n).astype(np.int32)
    got = np.asarray(counting.mxu_histogram(v, k))
    want = np.bincount(v, minlength=k)
    assert np.array_equal(got, want)


def test_mxu_histogram_drops_out_of_range():
    v = np.array([0, 5, 256, 300, 255, -1], np.int32)
    got = np.asarray(counting.mxu_histogram(v, 256))
    want = np.bincount(np.array([0, 5, 255]), minlength=256)
    assert np.array_equal(got, want)


def test_supports_predicate():
    assert counting.supports(np.uint8, (), None)
    assert counting.supports(np.int32, (), 10)
    assert not counting.supports(np.float32, (), 10)
    assert not counting.supports(np.uint64, (), 10)
    assert not counting.supports(np.uint8, (np.uint8,), 10)
