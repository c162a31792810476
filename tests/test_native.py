"""Native C++ harness tests: cross-validation against the Python replicas.

The native payload generator (glibc srand/rand via libc) and the Python
vectorized replica (utils/cpp_rng.py) independently implement the same
protocol — they must agree byte-for-byte.  Keys from the native generator
(std::mt19937 + libstdc++ distributions) are checked for protocol
properties and determinism.
"""

import numpy as np
import pytest

from simd_radix_sort_tpu.utils import common, cpp_rng
from simd_radix_sort_tpu.utils import data as D

native = pytest.importorskip("simd_radix_sort_tpu.utils.native")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native harness not buildable")


def test_payloads_match_python_replica():
    for kdt in (np.int32, np.uint64, np.float32, np.uint8):
        keys = D.make_keys(500, kdt, D.Distribution.UNIFORM, seed=5)
        got = native.make_payloads(keys, (np.uint32, np.uint8, np.uint64))
        want = D.make_payload_cpp(keys, (np.uint32, np.uint8, np.uint64))
        for a, b in zip(got, want):
            assert np.array_equal(a.view(np.uint8), b.view(np.uint8)), kdt


def test_native_check_payloads():
    keys = D.make_keys(300, np.int32, D.Distribution.UNIFORM, seed=6)
    pays = native.make_payloads(keys, (np.uint16, np.uint64))
    assert native.check_payloads(keys, pays) == -1
    bad = list(pays)
    bad[0] = bad[0].copy()
    bad[0][7] ^= np.uint16(1)
    assert native.check_payloads(keys, tuple(bad)) == 7


def test_native_keys_deterministic_and_distributed():
    for kdt in common.KEY_DTYPES:
        a = native.make_keys(1000, kdt, D.Distribution.UNIFORM, seed=9)
        b = native.make_keys(1000, kdt, D.Distribution.UNIFORM, seed=9)
        assert np.array_equal(a.view(np.uint8), b.view(np.uint8))
        c = native.make_keys(1000, kdt, D.Distribution.UNIFORM, seed=10)
        assert not np.array_equal(a.view(np.uint8), c.view(np.uint8))
    z = native.make_keys(100, np.int32, D.Distribution.ZERO, seed=1)
    assert np.all(z == 0)
    zo = native.make_keys(1000, np.int16, D.Distribution.ZERO_ONE, seed=1)
    assert set(np.unique(zo)) <= {0, 1}
    s = native.make_keys(1000, np.int64, D.Distribution.SORTED, seed=1)
    assert np.all(s[:-1] <= s[1:])
    r = native.make_keys(1000, np.float32, D.Distribution.REVERSE_SORTED,
                         seed=1)
    assert np.all(r[:-1] >= r[1:])


def test_native_zeroone_matches_mt19937_model():
    """ZeroOne keys are K(mt19937() % 2) (data.hpp:117-121): the native
    stream must match our std::mt19937 Python replica exactly."""
    zo = native.make_keys(2000, np.int32, D.Distribution.ZERO_ONE, seed=77)
    want = (cpp_rng.Mt19937(77).draw(2000) % 2).astype(np.int32)
    assert np.array_equal(zo, want)


def test_native_is_sorted_and_multiset():
    keys = native.make_keys(5000, np.float64, D.Distribution.GAUSSIAN, seed=2)
    assert not native.is_sorted(keys)
    s = np.sort(keys)
    assert native.is_sorted(s)
    assert native.is_sorted(s[::-1].copy(), ascending=False)
    assert native.same_multiset(s, keys)
    t = s.copy()
    t[0] = t[1]
    assert not native.same_multiset(t, keys)


def test_end_to_end_native_dataset_through_sort():
    """Generate a reference-exact dataset natively, sort with the engine,
    validate with the native oracle."""
    import simd_radix_sort_tpu as srs
    keys = native.make_keys(4096, np.int32, D.Distribution.GAUSSIAN, seed=3)
    pays = native.make_payloads(keys, (np.uint64,))
    k, p = srs.sort(keys, pays[0])
    k = np.asarray(k)
    assert native.is_sorted(k)
    assert native.same_multiset(k, keys)
    assert native.check_payloads(k, (np.asarray(p),)) == -1


def test_native_pack_unpack_roundtrip():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(12)
    keys = rng.integers(0, 2**32, 10_000, dtype=np.uint32)
    pa = rng.integers(0, 2**16, 10_000, dtype=np.uint16)
    pb = rng.random(10_000, dtype=np.float32).astype(np.float32)
    packed = native.pack_rows(keys, (pa, pb))
    assert packed.shape == (10_000, 4 + 2 + 4)
    k2, (a2, b2) = native.unpack_rows(packed, np.uint32,
                                      [np.uint16, np.float32])
    assert np.array_equal(k2, keys)
    assert np.array_equal(a2, pa)
    assert np.array_equal(b2, pb)


def test_native_pack_matches_python_pack():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    import simd_radix_sort_tpu as srs
    rng = np.random.default_rng(13)
    keys = rng.integers(0, 2**16, 1000, dtype=np.uint16)
    pa = rng.integers(0, 2**16, 1000, dtype=np.uint16)
    native_packed = native.pack_rows(keys, (pa,))
    py_packed = np.asarray(srs.pack_rows(keys, (pa,)))
    assert np.array_equal(native_packed, py_packed)


def test_gaussian_narrow_int_wraps_not_clips():
    """Out-of-range Gaussian draws must WRAP through int64 (the reference's
    double->int conversion as gcc emits it, native/harness.cpp
    fill_gaussian), never clip: clipping piles ~20% of sigma=100 int8 draws
    onto the two dtype bounds.  (The python and native streams use
    different RNGs by design — protocol equivalence, not bit equality.)"""
    for dt, gen in ((np.int8, D.make_keys), (np.int8, None)):
        if gen is None:
            if not native.available():
                break
            keys = native.make_keys(50_000, dt, D.Distribution.GAUSSIAN, 9)
        else:
            keys = gen(50_000, dt, D.Distribution.GAUSSIAN, seed=9)
        frac_at_bounds = np.mean((keys == 127) | (keys == -128))
        assert frac_at_bounds < 0.02, (dt, gen, frac_at_bounds)


def test_native_is_sorted_float_total_order():
    """Floats validate in IEEE totalOrder carrier bits: NaN placement and
    -0.0/+0.0 order are checked, not waved through by numeric compares
    (round-3 review)."""
    if not native.available():
        pytest.skip("native harness unavailable")
    ok = np.array([-np.inf, -1.0, -0.0, 0.0, 2.0, np.inf, np.nan],
                  np.float64)
    assert native.is_sorted(ok)                      # totalOrder ascending
    assert not native.is_sorted(np.array([5.0, np.nan, 1.0], np.float64))
    assert not native.is_sorted(np.array([0.0, -0.0], np.float64))
    assert native.is_sorted(ok[::-1].copy(), ascending=False)
    assert native.check_payloads(ok, ()) == -1
