"""Thesis-style benchmark suite driver.

Functional equivalent of /root/reference/src/perf-thesis.cpp: runs the
per-distribution method tables, scaling sweeps, and tuning-knob sweeps,
writing reference-format .dat tables to ./bench_out/.

Scaled-down defaults (the full reference suite is ~150 experiments); pass
--full for the complete grid.  Usage:

    python scripts/perf_suite.py [--full] [--n 262144]
"""

import argparse
import sys

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from simd_radix_sort_tpu import perf  # noqa: E402
from simd_radix_sort_tpu.utils import data as D  # noqa: E402

# device engines + host baselines (seq/torch play the STLSort/IPP role,
# sort_methods.hpp:246-347)
METHODS = ["xla", "radix", "count", "seq", "torch"]

TYPE_COMBOS = [
    (np.int32, ()),
    (np.int32, (np.int32,)),
    (np.uint64, (np.uint64,)),
    (np.float32, ()),
    (np.float32, (np.int32,)),
    (np.float64, (np.float64,)),
    (np.uint8, ()),
    (np.int16, ()),
    (np.float64, ()),
    (np.uint64, ()),
    (np.uint32, ()),
]

DISTS = [D.Distribution.UNIFORM, D.Distribution.GAUSSIAN,
         D.Distribution.ZERO, D.Distribution.ZERO_ONE]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--n", type=int, default=1 << 18)  # reference n = 2^18
    ap.add_argument("--resume", action="store_true",
                    help="skip tables whose .dat already exists")
    args = ap.parse_args()

    combos = TYPE_COMBOS if args.full else TYPE_COMBOS[:4]
    dists = DISTS if args.full else DISTS[:2]

    import os

    def done(name):
        return args.resume and os.path.exists(os.path.join(perf.OUT_DIR, name))

    for k, ps in combos:
        for dist in dists:
            name = perf.table_name(k, ps, dist, args.n)
            if done(name):
                print("skip", name, flush=True)
                continue
            path = perf.perf_test(METHODS, args.n, k, ps, dist,
                                  reps=None if args.full else 3,
                                  warmups=1)
            print("wrote", path, flush=True)

    # scaling sweep (perf-thesis.cpp's perfTestNum family)
    path = perf.perf_test_num(METHODS, np.int32, (np.int32,),
                              max_num=1 << (22 if args.full else 18),
                              reps=3, warmups=1)
    print("wrote", path, flush=True)

    # tuning-knob sweep (threshold-sweep equivalent)
    path = perf.perf_test_block(args.n, np.int32, (np.int32,))
    print("wrote", path, flush=True)

    # pairwise speedup across payload-size factors (perfTestSpeedupAllKP)
    path = perf.perf_test_speedup("xla", "radix", args.n,
                                  reps=None if args.full else 3, warmups=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
