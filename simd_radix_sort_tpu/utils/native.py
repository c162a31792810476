"""ctypes bindings for the native C++ harness (native/harness.cpp).

The native library plays the reference's L5 harness role at native speed:
reference-exact dataset generation (std::mt19937 + libstdc++ distributions +
glibc rand payload protocol) and validation oracles fast enough for
100M+-row benchmark outputs.  Built on demand with the system toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from . import common

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsrsharness.so")

_TYPE_IDS = {np.dtype(d): i for i, d in enumerate(common.KEY_DTYPES)}

_lib = None


def _build():
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        # surface the compiler output — a swallowed build failure used to
        # masquerade as "method 'cpp' does not support ..." downstream
        raise RuntimeError(
            "native harness build failed:\n"
            + (e.stderr or e.stdout or "")[-2000:]) from e


def _sources_mtime() -> float:
    return max(os.path.getmtime(os.path.join(_NATIVE_DIR, f))
               for f in ("harness.cpp", "Makefile"))


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < _sources_mtime()):
            _build()
        L = ctypes.CDLL(_LIB_PATH)
        L.srs_make_keys.restype = ctypes.c_int
        L.srs_make_keys.argtypes = [ctypes.c_int, ctypes.c_int64,
                                    ctypes.c_int, ctypes.c_int64,
                                    ctypes.c_void_p]
        L.srs_make_payload_bytes.restype = ctypes.c_int
        L.srs_make_payload_bytes.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p]
        L.srs_check_payload_bytes.restype = ctypes.c_int64
        L.srs_check_payload_bytes.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p]
        L.srs_is_sorted.restype = ctypes.c_int
        L.srs_is_sorted.argtypes = [ctypes.c_int, ctypes.c_void_p,
                                    ctypes.c_int64, ctypes.c_int]
        L.srs_same_multiset.restype = ctypes.c_int
        L.srs_same_multiset.argtypes = [ctypes.c_int, ctypes.c_void_p,
                                        ctypes.c_void_p, ctypes.c_int64]
        L.srs_pack_rows.restype = ctypes.c_int
        L.srs_pack_rows.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_void_p]
        L.srs_unpack_rows.restype = ctypes.c_int
        L.srs_unpack_rows.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_void_p]
        L.srs_radix_argsort.restype = ctypes.c_int
        L.srs_radix_argsort.argtypes = [ctypes.c_int, ctypes.c_void_p,
                                        ctypes.c_int64, ctypes.c_void_p]
        _lib = L
    return _lib


_warned_unavailable = False


def available() -> bool:
    global _warned_unavailable
    try:
        lib()
        return True
    except Exception as e:
        if not _warned_unavailable:
            _warned_unavailable = True
            import sys
            print(f"[srs] native harness unavailable: {e}",
                  file=sys.stderr)
        return False


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def make_keys(num: int, dtype, distribution, seed: int = 0) -> np.ndarray:
    """Reference-exact keys (std::mt19937 + libstdc++ distributions), the
    C++ Data<K,...> constructor protocol (data.hpp:105-170)."""
    from . import data as D
    dtype = np.dtype(dtype)
    dist_id = list(D.Distribution).index(D.Distribution(distribution)
                                         if not isinstance(distribution,
                                                           D.Distribution)
                                         else distribution)
    out = np.empty(num, dtype=dtype)
    rc = lib().srs_make_keys(_TYPE_IDS[dtype], num, dist_id, seed, _ptr(out))
    if rc != 0:
        raise RuntimeError(f"srs_make_keys failed: {rc}")
    return out


def make_payloads(keys: np.ndarray, payload_dtypes):
    """Reference-exact payloads (glibc srand/rand protocol, data.hpp:393-406)
    at native speed."""
    keys = np.ascontiguousarray(keys)
    dts = [np.dtype(d) for d in payload_dtypes]
    total = sum(d.itemsize for d in dts)
    packed = np.empty((len(keys), total), dtype=np.uint8)
    rc = lib().srs_make_payload_bytes(keys.dtype.itemsize, _ptr(keys),
                                      len(keys), total, _ptr(packed))
    if rc != 0:
        raise RuntimeError(f"srs_make_payload_bytes failed: {rc}")
    out = []
    off = 0
    for d in dts:
        col = np.ascontiguousarray(packed[:, off:off + d.itemsize])
        out.append(col.reshape(-1).view(d))
        off += d.itemsize
    return tuple(out)


def check_payloads(keys: np.ndarray, payloads) -> int:
    """Returns -1 if every payload regenerates from its key, else the first
    bad row index (checkPayloads, data.hpp:249-270)."""
    keys = np.ascontiguousarray(keys)
    payloads = [np.asarray(p) for p in payloads]
    if not payloads:
        return -1
    # pack only the payload columns, with the threaded native packer —
    # routing through ops.sort.pack_rows built a key+payload matrix
    # single-threaded and copied it again to drop the key bytes (GBs of
    # avoidable copies at this module's 100M-row scale)
    packed = pack_rows(payloads[0], payloads[1:])
    total = packed.shape[1]
    return int(lib().srs_check_payload_bytes(
        keys.dtype.itemsize, _ptr(keys), len(keys), total, _ptr(packed)))


def is_sorted(keys: np.ndarray, ascending: bool = True) -> bool:
    keys = np.ascontiguousarray(keys)
    if keys.dtype.kind == "f":
        # the engines order floats by IEEE totalOrder bits (-0.0 < +0.0,
        # NaNs by bit pattern); the native numeric compare would wave
        # through ANY NaN placement (every NaN comparison is false) —
        # validate the order-preserving unsigned carrier instead
        from . import transforms
        keys = np.ascontiguousarray(
            transforms.to_sortable_np(keys, ascending))
        ascending = True
    return bool(lib().srs_is_sorted(_TYPE_IDS[np.dtype(keys.dtype)],
                                    _ptr(keys), len(keys), int(ascending)))


def same_multiset(a: np.ndarray, b: np.ndarray) -> bool:
    a = np.ascontiguousarray(a)
    b = np.ascontiguousarray(b)
    assert a.dtype == b.dtype and a.shape == b.shape
    return bool(lib().srs_same_multiset(_TYPE_IDS[np.dtype(a.dtype)],
                                        _ptr(a), _ptr(b), len(a)))


def _col_ptrs(cols):
    arr = (ctypes.c_void_p * len(cols))(*[c.ctypes.data for c in cols])
    sizes = (ctypes.c_int32 * len(cols))(*[c.dtype.itemsize for c in cols])
    return arr, sizes


def pack_rows(keys: np.ndarray, payloads=()) -> np.ndarray:
    """SoA -> AoS packed rows (convertToSingleArray, data.hpp:332-346),
    threaded native memcpy.  Row stride = sum of element sizes (callers pad
    like DataElement when a power-of-two stride is required)."""
    cols = [np.ascontiguousarray(keys)] + [np.ascontiguousarray(p)
                                           for p in payloads]
    n = len(cols[0])
    stride = sum(c.dtype.itemsize for c in cols)
    out = np.empty(n * stride, dtype=np.uint8)
    ptrs, sizes = _col_ptrs(cols)
    got = lib().srs_pack_rows(len(cols), ptrs, sizes, n,
                              out.ctypes.data)
    assert got == stride
    return out.reshape(n, stride)


def unpack_rows(packed: np.ndarray, key_dtype, payload_dtypes=()):
    """AoS -> SoA (setFromSingleArray, data.hpp:348-361), threaded."""
    packed = np.ascontiguousarray(packed)
    n = packed.shape[0]
    cols = [np.empty(n, dtype=np.dtype(key_dtype))] + \
        [np.empty(n, dtype=np.dtype(d)) for d in payload_dtypes]
    stride = sum(c.dtype.itemsize for c in cols)
    assert packed.shape == (n, stride), (packed.shape, stride)
    ptrs, sizes = _col_ptrs(cols)
    got = lib().srs_unpack_rows(len(cols), ptrs, sizes, n,
                                packed.ctypes.data)
    assert got == stride
    return cols[0], tuple(cols[1:])


def radix_argsort(carrier: np.ndarray) -> np.ndarray:
    """Stable sorting permutation of an unsigned carrier array via the
    native threaded LSD byte radix (harness.cpp srs_radix_argsort) — the
    framework's own native-code baseline sorter (the bramas/blacher/IPP
    role of the reference suite)."""
    carrier = np.ascontiguousarray(carrier)
    assert carrier.dtype.kind == "u", carrier.dtype
    perm = np.empty(carrier.shape[0], dtype=np.int64)
    rc = lib().srs_radix_argsort(carrier.dtype.itemsize, _ptr(carrier),
                                 carrier.shape[0], _ptr(perm))
    if rc != 0:
        raise RuntimeError(f"srs_radix_argsort failed ({rc})")
    return perm


def sort_np(keys: np.ndarray, *payloads: np.ndarray, ascending: bool = True):
    """Host sort via the native radix argsort: transform keys to the
    unsigned carrier, argsort natively, gather keys+payloads vectorized.
    Returns (keys_sorted, *payloads_sorted) — the "cpp" registry method."""
    from . import transforms
    u = transforms.to_sortable_np(np.asarray(keys), ascending)
    perm = radix_argsort(u)
    return (np.asarray(keys)[perm],) + tuple(np.asarray(p)[perm]
                                             for p in payloads)
