"""North-star config 3: 100M-row combined-layout (AoS) multi-payload sort.

BASELINE.json config 3: "100M-row sort with multi-payload tuples
(DataElement<K,Ps...> combined layout) on one host, HBM-roofline
comparison vs IPP/x86-simd-sort numbers".  The committed bench grid
covers the combined layout at the reference's own sizes (4096 / 262144,
bench_out/combined-*.dat); this measures it at 1e8 rows — u64 key +
2 x u64 payloads, 24-byte elements (the reference's DataElement<K,Ps...>
shape, src/data.hpp:25-53, sorted via radix_sort.hpp:314-332).

The 2.4 GB table is generated ON DEVICE (splitmix64 of the row index) so
nothing crosses the host tunnel; validation also runs on device:
  * key sortedness recomputed from each row's leading 8 bytes,
  * whole-row multiset conservation via an order-independent fingerprint
    (each 24-byte row mixed into one u64; sum and xor across rows) —
    catches any dropped/duplicated/torn row, and binds payload bytes to
    their key since the whole row enters one fingerprint.

Usage: python scripts/combined_1e8.py [--n 1e8] [--reps 3]
       SRS_PLATFORM=cpu python scripts/combined_1e8.py --n 1e5 --validate
"""

import argparse
import json

import benchlib
import jax
import jax.numpy as jnp
import numpy as np

from benchlib import M2, M3, splitmix64
from simd_radix_sort_tpu.models import roofline
from simd_radix_sort_tpu.ops import sort as sort_ops

ESIZE = 24  # u64 key + u64 + u64 payloads


def gen_packed(n: int):
    """(n, 24) uint8 combined rows, generated on device from the row index."""
    i = jnp.arange(n, dtype=jnp.uint64)
    words = []  # 6 little-endian u32 columns: key lo/hi, p0 lo/hi, p1 lo/hi
    for s in range(3):
        salt = np.uint64((s * int(M3)) & 0xFFFFFFFFFFFFFFFF)
        v = splitmix64(i ^ salt)
        words.append(v.astype(jnp.uint32))
        words.append((v >> np.uint64(32)).astype(jnp.uint32))
    cols = []
    for w in words:
        for shift in (0, 8, 16, 24):
            cols.append((w >> jnp.uint32(shift)).astype(jnp.uint8))
    return jnp.stack(cols, axis=1)


def row_fingerprint(packed):
    """Order-independent (sum, xor) of a per-row u64 mix of all 24 bytes."""
    words = []
    for w in range(ESIZE // 4):
        b = [packed[:, 4 * w + j].astype(jnp.uint32) for j in range(4)]
        words.append(b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24))
    h = jnp.zeros(packed.shape[0], jnp.uint64)
    for j, w in enumerate(words):
        h = (h ^ w.astype(jnp.uint64)) * (M2 + np.uint64(2 * j))
    return jnp.sum(h), jnp.bitwise_xor.reduce(h)


def key_of(packed):
    lo = jnp.zeros(packed.shape[0], jnp.uint32)
    hi = jnp.zeros(packed.shape[0], jnp.uint32)
    for b in range(4):
        lo = lo | (packed[:, b].astype(jnp.uint32) << jnp.uint32(8 * b))
        hi = hi | (packed[:, 4 + b].astype(jnp.uint32) << jnp.uint32(8 * b))
    return hi, lo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=float, default=1e8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--validate", action="store_true",
                    help="also byte-compare against the NumPy model")
    args = ap.parse_args()
    n = int(args.n)

    gen = jax.jit(gen_packed, static_argnums=0)
    run = jax.jit(lambda p: sort_ops.sort_packed(p, np.uint64))

    packed = gen(n)
    benchlib.fence(packed)
    # per-rep fence: one 2.4 GB result per rep; queued-rep buffers OOM HBM
    sec = benchlib.timeit(run, (packed,), reps=args.reps, warmup=1,
                          per_rep_fence=True)
    out = run(packed)

    @jax.jit
    def gate(inp, outp):
        hi, lo = key_of(outp)
        asc = (hi[:-1] < hi[1:]) | ((hi[:-1] == hi[1:]) & (lo[:-1] <= lo[1:]))
        fs_in, fx_in = row_fingerprint(inp)
        fs_out, fx_out = row_fingerprint(outp)
        return jnp.all(asc), fs_in == fs_out, fx_in == fx_out

    sorted_ok, sum_ok, xor_ok = (bool(np.asarray(v)) for v in
                                 gate(packed, out))
    assert sorted_ok, "combined output not key-sorted"
    assert sum_ok and xor_ok, "row multiset fingerprint mismatch"

    if args.validate:
        pk = np.asarray(packed)
        keys = np.ascontiguousarray(pk[:, :8]).view("<u8").ravel()
        want = pk[np.argsort(keys, kind="stable")]
        assert np.array_equal(np.asarray(out), want), "NumPy model mismatch"
        print(f"validate ok: n={n}")

    rows_per_s = n / sec
    roof = roofline.radix_sort_roofline_rows_per_s(row_bytes=ESIZE,
                                                   key_bits=64)
    print(json.dumps({
        "metric": "combined u64+2xu64 (24B rows) sort rows/s/chip",
        "value": round(rows_per_s),
        "unit": "rows/s",
        "n": n, "seconds_per_sort": round(sec, 4),
        "hbm_roofline_rows_per_s": round(roof),
        "roofline_frac": round(rows_per_s / roof, 4),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
