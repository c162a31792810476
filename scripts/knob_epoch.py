"""One clean-epoch knob-sweep campaign at perf-thesis breadth.

The reference commits cmpSortThreshold sweeps for its 12 key/payload
combos x 4 distributions (perf-thesis.cpp:45-222, perf.hpp:159-212 —
48+ cmpThresh tables under bachelors-thesis/data/).  This drives the
TPU engines' equivalent knobs over the SAME grid in one epoch:

  * thresh-quick-*: the device quicksort's block_threshold (target
    segment size of the sampled-splitter partition) — the same
    pass-count vs base-case-cost trade the reference's threshold
    controls.  12 combos x 4 dists = 48 tables.
  * digits-*: the LSD radix engine's digit width (pass count vs
    per-pass cost), 12 combos x Uniform = 12 tables (the digit-width
    optimum is distribution-independent for the sort-mover engine —
    every pass is one full lax.sort whose cost does not depend on the
    digit values; asserted by the Uniform/Gaussian pair committed for
    int32+int32).

Type combos mirror perf-thesis.cpp:45-57 exactly:
  (float,i64) (i8,i64) (i16,i64) (i32,i64) (float,) (float,i32)
  (double,) (double,i64) (i8,) (i16,) (i32,) (i64,)

Run IDLE (1-core host, single chip — any concurrent work pollutes
cells): python scripts/knob_epoch.py [--n 262144] [--resume]
Writes bench_out/*.dat; prints one line per table; exits nonzero if any
table failed.  --resume skips tables that already exist (same contract
as perf_suite.py --resume).
"""

import argparse
import os
import sys
import time
import traceback

import benchlib  # noqa: F401  (jax config: x64 + compile cache)
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from simd_radix_sort_tpu import perf  # noqa: E402
from simd_radix_sort_tpu.utils import data as D  # noqa: E402

# perf-thesis.cpp:45-57's 12 combos, in its order
COMBOS = [
    (np.float32, (np.int64,)),
    (np.int8, (np.int64,)),
    (np.int16, (np.int64,)),
    (np.int32, (np.int64,)),
    (np.float32, ()),
    (np.float32, (np.int32,)),
    (np.float64, ()),
    (np.float64, (np.int64,)),
    (np.int8, ()),
    (np.int16, ()),
    (np.int32, ()),
    (np.int64, ()),
]
DISTS = [D.Distribution.UNIFORM, D.Distribution.GAUSSIAN,
         D.Distribution.ZERO, D.Distribution.ZERO_ONE]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 18)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    out_dir = perf.OUT_DIR
    failures = []
    t0 = time.time()

    def run(kind, fn, name):
        if args.resume and os.path.exists(os.path.join(out_dir, name)):
            print(f"skip {name}", flush=True)
            return
        t = time.time()
        try:
            path = fn()
            print(f"wrote {path} ({time.time() - t:.1f} s)", flush=True)
        except Exception:
            failures.append(name)
            print(f"FAILED {name}\n{traceback.format_exc()}", flush=True)

    for k, ps in COMBOS:
        for dist in DISTS:
            name = ("thresh-quick-"
                    + "-".join([perf.common.type_name(k)]
                               + [perf.common.type_name(p) for p in ps]
                               + [dist.value, str(args.n)]) + ".dat")
            run("thresh", lambda k=k, ps=ps, dist=dist:
                perf.perf_test_thresh(args.n, k, ps, distribution=dist),
                name)
    for k, ps in COMBOS:
        name = ("digits-" + "-".join(
            [perf.common.type_name(k)]
            + [perf.common.type_name(p) for p in ps]
            + [D.Distribution.UNIFORM.value, str(args.n)]) + ".dat")
        run("digits", lambda k=k, ps=ps:
            perf.perf_test_block(args.n, k, ps), name)

    print(f"knob epoch done in {(time.time() - t0) / 60:.1f} min; "
          f"{len(failures)} failures", flush=True)
    if failures:
        print("failed tables:", *failures, sep="\n  ")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
