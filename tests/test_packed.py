"""Combined (AoS) layout tests — DataElement<K,Ps...> parity.

Mirrors the reference's Combined arm of the matrix (test.cpp:44-50):
pack to a single array, sort packed, unpack, validate with the same oracle.
"""

import numpy as np
import pytest

import simd_radix_sort_tpu as srs
from simd_radix_sort_tpu.utils import common
from simd_radix_sort_tpu.utils import data as D

CASES = [
    (np.int32, (np.uint32,)),          # 8-byte element
    (np.float32, (np.uint32, np.uint64)),  # 16-byte element
    (np.uint64, (np.uint64,)),         # 16-byte element
    (np.uint8, ()),                    # 1-byte element
    (np.int16, (np.uint8,)),           # 3-byte element (non-pow2: we allow it)
    (np.float64, (np.uint64, np.uint64, np.uint64)),  # 32-byte element
]


@pytest.mark.parametrize("key_dtype,payload_dtypes", CASES,
                         ids=lambda c: str(c))
@pytest.mark.parametrize("ascending", [True, False], ids=["asc", "desc"])
def test_packed_roundtrip(key_dtype, payload_dtypes, ascending):
    keys = D.make_keys(500, key_dtype, D.Distribution.UNIFORM, 21)
    payloads = D.make_payloads(keys, payload_dtypes, "fast")
    packed = srs.pack_rows(keys, payloads)
    assert packed.shape == (500, common.element_size(key_dtype, payload_dtypes))

    # pack/unpack must be lossless
    k2, p2 = srs.unpack_rows(packed, key_dtype, payload_dtypes)
    assert np.array_equal(k2.view(np.uint8), keys.view(np.uint8))
    for a, b in zip(p2, payloads):
        assert np.array_equal(a.view(np.uint8), b.view(np.uint8))

    out = np.asarray(srs.sort_packed(packed, key_dtype, ascending=ascending))
    k3, p3 = srs.unpack_rows(out, key_dtype, payload_dtypes)
    err = D.check_data(k3, p3, keys, ascending)
    assert err == "", err

    # combined and separate layouts must produce identical bytes
    ks, ps = srs.sort_with_payloads(keys, payloads, ascending=ascending)
    want = srs.pack_rows(np.asarray(ks), [np.asarray(p) for p in ps])
    assert np.array_equal(out, want)


def test_packed_empty_and_single():
    for n in (0, 1):
        keys = D.make_keys(n, np.int32, D.Distribution.UNIFORM, 3)
        payloads = D.make_payloads(keys, (np.uint16,), "fast")
        packed = srs.pack_rows(keys, payloads)
        out = np.asarray(srs.sort_packed(packed, np.int32))
        assert out.shape == packed.shape


def test_packed_64_byte_elements():
    """The reference's largest DataElement: u64 key + 56 payload bytes
    (test.cpp:100-153 drives u8x63 / 64-byte combined elements through the
    multi-register vector paths; here the row packs into 16 u32 words)."""
    rng = np.random.default_rng(99)
    n = 4096
    keys = rng.integers(0, 2**64, n, dtype=np.uint64)
    pays = tuple(rng.integers(0, 2**64, n, dtype=np.uint64) for _ in range(7))
    packed = srs.pack_rows(keys, pays)
    assert packed.shape == (n, 64)
    out = np.asarray(srs.sort_packed(packed, np.uint64))
    k2, p2 = srs.unpack_rows(out, np.uint64, [np.uint64] * 7)
    order = np.argsort(keys, kind="stable")
    assert np.array_equal(k2, keys[order])
    for got, src in zip(p2, pays):
        # payload rows must follow their keys; with (vanishingly unlikely)
        # duplicate u64 keys any within-group order is fine
        assert np.array_equal(got, src[order])


FACADE_METHODS = ["xla", "radix", "quick", "auto"]


@pytest.mark.parametrize("method", FACADE_METHODS)
def test_packed_method_facade(method):
    """sort_packed routes through the method facade (round-5: previously
    hardcoded the variadic-lax.sort path) — every device engine must
    produce oracle-correct packed output and byte-match the separate arm
    sorted with the same engine."""
    keys = D.make_keys(2000, np.int32, D.Distribution.GAUSSIAN, 7)
    payloads = D.make_payloads(keys, (np.uint32, np.uint8), "fast")
    packed = srs.pack_rows(keys, payloads)
    out = np.asarray(srs.sort_packed(packed, np.int32, method=method))
    k3, p3 = srs.unpack_rows(out, np.int32, (np.uint32, np.uint8))
    err = D.check_data(k3, p3, keys, True)
    assert err == "", f"{method}: {err}"


def test_packed_method_config_and_count():
    """config= supplies the method default; keys-only packed rows may route
    the counting engine (narrow integer keys)."""
    from simd_radix_sort_tpu.config import SortConfig

    keys = D.make_keys(3000, np.int32, D.Distribution.ZERO_ONE, 11)
    packed = srs.pack_rows(keys, ())
    out = np.asarray(srs.sort_packed(packed, np.int32,
                                     config=SortConfig(method="count")))
    k3, _ = srs.unpack_rows(out, np.int32, ())
    assert D.check_data(k3, (), keys, True) == ""

    # a payload-bearing packed sort must reject the counting engine
    keys2 = D.make_keys(100, np.int32, D.Distribution.UNIFORM, 5)
    pays2 = D.make_payloads(keys2, (np.uint32,), "fast")
    packed2 = srs.pack_rows(keys2, pays2)
    with pytest.raises(ValueError):
        srs.sort_packed(packed2, np.int32, method="count")


def test_packed_rank_and_f64_facade():
    """rank engine (n<=4096) and the f64 bits protocol both work through
    the packed facade."""
    keys = D.make_keys(1024, np.float64, D.Distribution.GAUSSIAN, 13)
    pays = D.make_payloads(keys, (np.uint64,), "fast")
    packed = srs.pack_rows(keys, pays)
    out = np.asarray(srs.sort_packed(packed, np.float64, method="rank"))
    k3, p3 = srs.unpack_rows(out, np.float64, (np.uint64,))
    assert D.check_data(k3, p3, keys, True) == ""
