"""Reference-style test driver: `python scripts/run_test_matrix.py [maxNum] [seed]`.

Functional equivalent of the reference's test binary
(/root/reference/src/test.cpp:181-224): sweeps sizes 1, 10, 100, ... maxNum
across sort configurations x layouts x directions x key types x payload
shapes x distributions, validates every cell with the payload-regeneration
oracle, prints pass/FAIL lines, exits 0/1.

The pytest suite (tests/) is the day-to-day CI; this driver is the
line-for-line behavioral twin of the reference's CLI protocol.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

import simd_radix_sort_tpu as srs  # noqa: E402
from simd_radix_sort_tpu import methods  # noqa: E402
from simd_radix_sort_tpu.utils import common, data as D  # noqa: E402

KEY_TYPES = [np.uint8, np.uint16, np.uint32, np.uint64,
             np.int8, np.int16, np.int32, np.int64,
             np.float32, np.float64]

# payload shapes mirroring test.cpp:100-153 (including multi-stream combos)
PAYLOADS = [
    (),
    (np.uint8,), (np.uint16,), (np.uint32,), (np.uint64,),
    (np.uint64, np.uint64),
    (np.uint64, np.uint8),
    (np.uint64, np.uint64, np.uint64),
    (np.uint8,) * 3,
]

METHODS = ["xla", "radix", "count", "rank", "quick", "quickseq", "torch", "seq", "cpp"]


def run_cell(method, combined, up, kdt, pdts, dist, num, seed):
    m = methods.REGISTRY[method]
    if not m.supports(np.dtype(kdt), tuple(np.dtype(p) for p in pdts), num):
        return None
    # (unlike the reference, combined layout has no power-of-two element
    # restriction here — non-power-of-two rows are tested too)
    keys = D.make_keys(num, kdt, dist, seed)
    pays = D.make_payloads(keys, pdts, "fast")
    label = (f"{method:6s} {'comb' if combined else 'sep '} "
             f"{'asc' if up else 'dsc'} {common.type_name(kdt):7s} "
             f"[{','.join(common.type_name(p) for p in pdts):23s}] "
             f"{dist.value:13s} n={num}")
    try:
        if combined:
            packed = srs.pack_rows(keys, pays)
            out = srs.sort_packed(packed, kdt, ascending=up)
            ko, po = srs.unpack_rows(np.asarray(out), kdt, list(pdts))
        else:
            res = srs.sort(keys, *pays, ascending=up, method=method)
            if pdts:
                ko, po = np.asarray(res[0]), tuple(np.asarray(p)
                                                   for p in res[1:])
            else:
                ko, po = np.asarray(res), ()
        err = D.check_data(ko, tuple(np.asarray(p) for p in po), keys, up)
    except Exception as e:  # noqa: BLE001 - report like the reference
        err = f"exception: {e}"
    if err:
        print(f"FAILED  {label}: {err}")
        return False
    print(f"passed  {label}")
    return True


def main():
    max_num = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    ok = True
    num = 1
    while num <= max_num:
        for method in METHODS:
            for combined in (False, True):
                if combined and method not in ("xla",):
                    continue  # packed layout routes through the xla engine
                for up in (True, False):
                    for kdt in KEY_TYPES:
                        for pdts in PAYLOADS:
                            for dist in D.ALL_DISTRIBUTIONS:
                                r = run_cell(method, combined, up, kdt, pdts,
                                             dist, num, seed)
                                ok &= r is not False
        num *= 10
    print("ALL PASSED" if ok else "SOME FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
