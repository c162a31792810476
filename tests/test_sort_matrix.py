"""The reference-style integration test matrix.

Re-creation of /root/reference/src/test.cpp's exhaustive matrix (SURVEY.md
section 4): {layouts} x {directions} x {key types} x {payload shapes} x
{distributions} x {sizes} x {methods}, validated with the key-seeded payload
oracle.  Because every payload is a deterministic function of its key,
any correct sort (stable or not) of the same input produces byte-identical
output — so each cell is ALSO checked bit-exactly against the NumPy model
(the BitSorterSequential differential-baseline role, radix_sort.hpp:66-92).

The default run samples the matrix (compile time on CPU dominates); pass
--full-matrix for the reference-sized sweep.
"""

import numpy as np
import pytest

import simd_radix_sort_tpu as srs
from simd_radix_sort_tpu.utils import common
from simd_radix_sort_tpu.utils import data as D

ALL_KEYS = list(common.KEY_DTYPES)

PAYLOAD_SHAPES = {
    "none": (),
    "u32": (np.uint32,),
    "u64": (np.uint64,),
    "u64+u8": (np.uint64, np.uint8),
    "f32": (np.float32,),
    "f64": (np.float64,),
    "3xu64": (np.uint64, np.uint64, np.uint64),
    "3xu8": (np.uint8, np.uint8, np.uint8),
}

FULL_ONLY_PAYLOADS = {
    "7xu64": (np.uint64,) * 7,
    "u8x7": (np.uint8,) * 7,
    "u8x15": (np.uint8,) * 15,
    "u8x31": (np.uint8,) * 31,
    "u8x63": (np.uint8,) * 63,
}


def run_cell(key_dtype, payload_dtypes, dist, n, method, ascending,
             seed=1234, protocol="fast"):
    keys = D.make_keys(n, key_dtype, dist, seed)
    payloads = D.make_payloads(keys, payload_dtypes, protocol)
    out = srs.sort_with_payloads(keys, payloads, ascending=ascending,
                                 method=method)
    k, ps = out
    k = np.asarray(k)
    ps = tuple(np.asarray(p) for p in ps)
    err = D.check_data(k, ps, keys, ascending, protocol)
    assert err == "", (
        f"{common.type_name(key_dtype)} {payload_dtypes} {dist} n={n} "
        f"{method} asc={ascending}: {err}")
    want = srs.sort_np(keys, *payloads, ascending=ascending)
    for got, exp in zip((k,) + ps, want):
        assert np.array_equal(np.asarray(got).view(np.uint8),
                              exp.view(np.uint8)), "differs from NumPy model"


@pytest.mark.parametrize("key_dtype", ALL_KEYS, ids=common.type_name)
@pytest.mark.parametrize("ascending", [True, False], ids=["asc", "desc"])
def test_all_key_types(key_dtype, ascending):
    run_cell(key_dtype, (np.uint32,), D.Distribution.UNIFORM, 1000,
             "xla", ascending)


@pytest.mark.parametrize("dist", D.ALL_DISTRIBUTIONS,
                         ids=[d.value for d in D.ALL_DISTRIBUTIONS])
@pytest.mark.parametrize("key_dtype", [np.int32, np.float32, np.uint64],
                         ids=common.type_name)
def test_all_distributions(key_dtype, dist):
    run_cell(key_dtype, (np.uint64,), dist, 1000, "xla", True)


@pytest.mark.parametrize("shape", sorted(PAYLOAD_SHAPES))
def test_payload_shapes(shape):
    run_cell(np.int32, PAYLOAD_SHAPES[shape], D.Distribution.UNIFORM,
             1000, "xla", True)


@pytest.mark.parametrize("method", ["xla", "radix", "rank", "seq", "quick", "quickseq", "torch", "cpp"])
@pytest.mark.parametrize("key_dtype", [np.uint32, np.int64, np.float64,
                                       np.uint8], ids=common.type_name)
def test_methods_agree(method, key_dtype):
    for ascending in (True, False):
        run_cell(key_dtype, (np.uint32,), D.Distribution.UNIFORM, 777,
                 method, ascending)


@pytest.mark.parametrize("n", [0, 1, 2, 10, 100, 1000])
def test_sizes(n):
    run_cell(np.int32, (np.uint32,), D.Distribution.UNIFORM, n, "xla", True)
    if 0 < n <= 4096:
        run_cell(np.int32, (np.uint32,), D.Distribution.UNIFORM, n, "rank",
                 True)
    run_cell(np.int32, (np.uint32,), D.Distribution.UNIFORM, n, "radix", True)


def test_cpp_payload_protocol():
    """The reference-exact payload protocol (glibc srand/rand) round-trips
    through sort + oracle — across engines, not just xla (the golden A/B
    harness runs this protocol against the actual reference binary for
    every engine; this is the in-suite guard)."""
    run_cell(np.int32, (np.uint32, np.uint8), D.Distribution.UNIFORM, 500,
             "xla", True, protocol="cpp")
    run_cell(np.float64, (np.uint64,), D.Distribution.GAUSSIAN, 300,
             "xla", False, protocol="cpp")
    for method in ("quick", "radix", "rank", "cpp", "seq"):
        run_cell(np.uint32, (np.uint64,), D.Distribution.ZERO_ONE, 400,
                 method, True, protocol="cpp")


def test_duplicate_heavy_keys():
    """ZeroOne / Zero / narrow dtypes exercise massive duplication, the case
    where unstable sorts must still keep key<->payload correspondence."""
    for dist in (D.Distribution.ZERO, D.Distribution.ZERO_ONE):
        for method in ("xla", "radix", "rank"):
            run_cell(np.uint8, (np.uint64,), dist, 999, method, True)


def test_oracle_catches_corruption():
    """Mutation test: the oracle must reject broken outputs."""
    keys = D.make_keys(100, np.int32, D.Distribution.UNIFORM, 5)
    (p,) = D.make_payloads(keys, [np.uint32], "fast")
    k, ps = srs.sort_with_payloads(keys, (p,))
    k = np.asarray(k).copy()
    ps = np.asarray(ps[0]).copy()
    # swap two payloads of different keys
    assert k[0] != k[50]
    bad = ps.copy()
    bad[0], bad[50] = bad[50], bad[0]
    assert "payloads" in D.check_data(k, (bad,), keys, True)
    # unsorted keys
    bad_k = k.copy()
    bad_k[0], bad_k[-1] = bad_k[-1], bad_k[0]
    assert "not sorted" in D.check_data(bad_k, (ps,), keys, True)
    # dropped key
    bad_k = k.copy()
    bad_k[0] = bad_k[1]
    assert "multiset" in D.check_data(np.sort(bad_k), (ps,), keys, True)


def run_cell_packed(key_dtype, payload_dtypes, dist, n, ascending,
                    seed=1234, protocol="fast"):
    """Combined-layout cell: pack -> sort_packed -> unpack -> oracle (the
    test.cpp:44-50 combined arm)."""
    from simd_radix_sort_tpu.ops import sort as sort_mod
    keys = D.make_keys(n, key_dtype, dist, seed)
    payloads = D.make_payloads(keys, payload_dtypes, protocol)
    packed = sort_mod.pack_rows(keys, payloads)
    out = srs.sort_packed(packed, key_dtype, ascending=ascending)
    k, ps = sort_mod.unpack_rows(np.asarray(out), key_dtype, payload_dtypes)
    err = D.check_data(np.asarray(k), tuple(np.asarray(p) for p in ps),
                       keys, ascending, protocol)
    assert err == "", (
        f"packed {common.type_name(key_dtype)} {payload_dtypes} {dist} "
        f"n={n} asc={ascending}: {err}")


def test_full_matrix(full_matrix):
    """The reference-sized sweep (test.cpp:100-153,174-215): separate AND
    combined layouts, every key type, payload shapes up to u8x63 / 7xu64
    (64-byte elements), all distributions, plus an every-engine pass on the
    widest shapes.  Opt-in: run once per round and commit the log
    (MATRIX_r03.log)."""
    if not full_matrix:
        pytest.skip("pass --full-matrix for the reference-sized sweep")
    shapes = dict(PAYLOAD_SHAPES)
    shapes.update(FULL_ONLY_PAYLOADS)
    for key_dtype in ALL_KEYS:
        for name, pls in shapes.items():
            for dist in D.ALL_DISTRIBUTIONS:
                for n in (1, 10, 100, 1000, 10000):
                    for ascending in (True, False):
                        run_cell(key_dtype, pls, dist, n, "xla", ascending)


def test_full_matrix_combined(full_matrix):
    """Combined (AoS) arm of the full sweep: every key x payload shape with
    a power-of-two element size (the reference's combined gate,
    test.cpp:81-82 — ours also accepts non-pow2, covered in
    test_packed.py)."""
    if not full_matrix:
        pytest.skip("pass --full-matrix for the reference-sized sweep")
    shapes = dict(PAYLOAD_SHAPES)
    shapes.update(FULL_ONLY_PAYLOADS)
    for key_dtype in ALL_KEYS:
        for name, pls in shapes.items():
            esize = np.dtype(key_dtype).itemsize + sum(
                np.dtype(p).itemsize for p in pls)
            if esize & (esize - 1):
                continue
            for dist in (D.Distribution.UNIFORM, D.Distribution.ZERO_ONE):
                for n in (1, 1000, 10000):
                    for ascending in (True, False):
                        run_cell_packed(key_dtype, pls, dist, n, ascending)


def test_full_matrix_engines(full_matrix):
    """Every registered engine on the widest payload tuples (the
    reference's per-method sweep, test.cpp:174-215, previously xla-only
    here)."""
    if not full_matrix:
        pytest.skip("pass --full-matrix for the reference-sized sweep")
    for method in ("radix", "quick", "rank", "seq", "quickseq", "torch",
                   "cpp"):
        for key_dtype in (np.uint32, np.uint64):
            for pls in (FULL_ONLY_PAYLOADS["7xu64"],
                        FULL_ONLY_PAYLOADS["u8x63"]):
                for ascending in (True, False):
                    run_cell(key_dtype, pls, D.Distribution.UNIFORM, 1000,
                             method, ascending)


def test_unsupported_dtype_errors():
    with pytest.raises((TypeError, ValueError)):
        srs.sort(np.zeros(4, dtype=np.complex64))
    with pytest.raises(ValueError):
        srs.sort(np.zeros(4, dtype=np.int32), method="nope")


def test_argsort_and_batched():
    from simd_radix_sort_tpu.ops import sort as sort_mod
    rng = np.random.default_rng(41)
    keys = rng.integers(-1000, 1000, 5000).astype(np.int32)
    perm = np.asarray(sort_mod.argsort(keys))
    assert np.array_equal(keys[perm], np.sort(keys))
    k2 = rng.normal(size=(8, 256)).astype(np.float32)
    p2 = (k2 * 2).astype(np.float32)
    ks, ps = sort_mod.sort_batched(k2, p2)
    assert np.array_equal(np.asarray(ks), np.sort(k2, axis=1))
    assert np.allclose(np.asarray(ps), np.sort(k2, axis=1) * 2)
    kd = sort_mod.sort_batched(k2, ascending=False)
    assert np.array_equal(np.asarray(kd), np.sort(k2, axis=1)[:, ::-1])
