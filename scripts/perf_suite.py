"""Thesis-style benchmark suite driver.

Functional equivalent of /root/reference/src/perf-thesis.cpp (the ~150
std::function experiment entries, perf-thesis.cpp:45-226) plus the
quicksort-focused study of src/perf-paper.cpp:22-115: per-distribution
method tables across all 8 input distributions, n-scaling sweeps,
tuning-knob sweeps (radix digit width + quicksort threshold), pairwise
payload-factor speedups, combined-layout studies, and small-n tables where
the rank block sorter participates.  Writes reference-format .dat tables
to ./bench_out/.

Scaled-down defaults; pass --full for the complete grid (~1-2 h through
the axon tunnel — keep the TPU otherwise idle).  Usage:

    python scripts/perf_suite.py [--full] [--n 262144] [--resume]
"""

import argparse
import os
import sys

import jax

jax.config.update("jax_enable_x64", True)
# persistent compile cache: axon remote compiles take 20-60 s per shape,
# one line makes re-runs ~free (measured 16.2 s -> 0.1 s)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 os.path.expanduser("~/.cache/jax_comp_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from simd_radix_sort_tpu import perf  # noqa: E402
from simd_radix_sort_tpu.utils import data as D  # noqa: E402

# device engines + host baselines (seq/torch play the STLSort/IPP role,
# sort_methods.hpp:246-347).  rank is size-capped and appears in the
# small-n tables below.
METHODS = ["xla", "radix", "count", "quick", "seq", "torch", "cpp"]

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

# the reference's 4 core distributions ...
DISTS = [D.Distribution.UNIFORM, D.Distribution.GAUSSIAN,
         D.Distribution.ZERO, D.Distribution.ZERO_ONE]
# ... plus the sorted families (data.hpp:64-73; --full only)
DISTS_SORTED = [D.Distribution.SORTED, D.Distribution.REVERSE_SORTED,
                D.Distribution.ALMOST_SORTED,
                D.Distribution.ALMOST_REVERSE_SORTED]

# quicksort-focused study (perf-paper.cpp:22-115): quick engine vs its
# host differential model vs the general engines
QUICK_METHODS = ["quick", "quickseq", "xla", "torch"]
QUICK_COMBOS = [(np.int32, ()), (np.int32, (np.int32,)),
                (np.float64, (np.float64,))]

# round-5 tpe-breadth tier: the reference's 8 published tpe type combos
# (src/perf.hpp:368-416; bachelors-thesis/data/tpe-*.dat) at the three
# distributions that anchor the crossover claims.  Engines per combo:
# xla (the shipped winner) everywhere, count where it applies (the
# count-vs-xla crossover), quick where its compiles are already cached,
# and the native cpp baseline (no device compile cost).
# ordered by information value per minute (the count-vs-xla crossover
# combo first; int32+int32 second — its compiles are cache-warm from the
# committed full-range sweep), so a --resume'd partial run keeps the
# highest-value tables
TPE_BREADTH = [
    ((np.int32, ()), ["xla", "count", "cpp"]),
    ((np.int32, (np.int32,)), ["xla", "quick", "cpp"]),
    ((np.float32, ()), ["xla", "cpp"]),
    ((np.float64, ()), ["xla", "cpp"]),
    ((np.int64, ()), ["xla", "cpp"]),
    ((np.float32, (np.int32,)), ["xla", "cpp"]),
    ((np.int64, (np.int64,)), ["xla", "cpp"]),
    ((np.float64, (np.int64,)), ["xla", "cpp"]),
]
TPE_BREADTH_DISTS = [D.Distribution.UNIFORM, D.Distribution.SORTED,
                     D.Distribution.ZERO]

# round-5 packed-path engine tables (sort_packed through the facade).
# Large-n tier per combo: 1e8 rows OOM 16 GB HBM for the wide combos
# (input + 6-8 sort streams + byte reassembly peak; the 24 B config-3
# anchor at the full 1e8 is COMBINED_1E8_r04.json), so the wide rows
# measure at the largest n that holds.
PACKED_COMBOS = [
    (np.int32, (np.int32,), 10**8),       # 8-byte rows: packing wins
    (np.uint64, (np.uint64,), 6 * 10**7),   # 16-byte headline shape
    (np.uint64, (np.uint64, np.uint64), 4 * 10**7),  # 24-byte config 3
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--n", type=int, default=1 << 18)  # reference n = 2^18
    ap.add_argument("--resume", action="store_true",
                    help="skip tables whose .dat already exists")
    ap.add_argument("--int8", action="store_true",
                    help="round-5 tier: int8 x all 8 distributions at the "
                         "reference n (the one published type combo with "
                         "no our-side cells through round 4)")
    ap.add_argument("--tpe-breadth", action="store_true",
                    help="round-5 tier: tpe scaling sweeps for the "
                         "reference's 8 published tpe combos x "
                         "{Uniform,Sorted,Zero}, n=2^10..2^22, plus 1e8 "
                         "anchor cells (device-gate validated)")
    ap.add_argument("--packed", action="store_true",
                    help="round-5 tier: combined-layout engine tables "
                         "(sort_packed through the method facade)")
    args = ap.parse_args()

    combos = TYPE_COMBOS if args.full else TYPE_COMBOS[:4]
    dists = (DISTS + DISTS_SORTED) if args.full else DISTS[:2]

    def done(name):
        return args.resume and os.path.exists(os.path.join(perf.OUT_DIR, name))

    if args.int8 or args.tpe_breadth or args.packed:
        if args.int8:
            for dist in DISTS + DISTS_SORTED:
                name = perf.table_name(np.int8, (), dist, args.n)
                if done(name):
                    print("skip", name, flush=True)
                    continue
                path = perf.perf_test(METHODS, args.n, np.int8, (), dist,
                                      reps=None, warmups=1)
                print("wrote", path, flush=True)
        if args.tpe_breadth:
            for (k, ps), meths in TPE_BREADTH:
                base = "-".join([perf.common.type_name(k)]
                                + [perf.common.type_name(p) for p in ps])
                for dist in TPE_BREADTH_DISTS:
                    nm = f"tpe-{base}-{dist.value}.dat"
                    if done(nm):
                        print("skip", nm, flush=True)
                        continue
                    path = perf.perf_test_num(meths, k, ps, dist,
                                              min_num=1 << 10,
                                              max_num=1 << 22,
                                              reps=None, warmups=1)
                    print("wrote", path, flush=True)
                # 1e8 anchor cell (device-gate validated: pulling the
                # output through the tunnel would dwarf the measurement)
                nm = f"tpe-anchor-{base}-Uniform-100000000.dat"
                if done(nm):
                    print("skip", nm, flush=True)
                    continue
                anchor_meths = [m for m in meths if m not in ("cpp",)]
                path = perf.perf_test(anchor_meths, 10**8, k, ps,
                                      D.Distribution.UNIFORM, out_name=nm,
                                      reps=3, warmups=1, validate="device")
                print("wrote", path, flush=True)
        if args.packed:
            for k, ps, big_n in PACKED_COMBOS:
                for num in (args.n, big_n):
                    base = "-".join(
                        [perf.common.type_name(k)]
                        + [perf.common.type_name(p) for p in ps])
                    nm = f"packed-{base}-Uniform-{num}.dat"
                    if done(nm):
                        print("skip", nm, flush=True)
                        continue
                    # radix is the differential engine; at large n its
                    # extra digit-pass intermediates crowd HBM for no
                    # policy information (the 2^18 cells already place it)
                    big = num >= 4 * 10**7
                    meths = ("xla", "quick") if big \
                        else ("xla", "radix", "quick")
                    path = perf.perf_test_packed(
                        num, k, ps, methods=meths,
                        reps=3 if big else None, validate=not big)
                    print("wrote", path, flush=True)
        return

    # ---- per-distribution method tables (perf-thesis.cpp:120-222) -------
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

    # ---- small-n tables with the rank block sorter ----------------------
    for k, ps in ([(np.int32, (np.int32,)), (np.uint64, (np.uint64,))]
                  if args.full else [(np.int32, (np.int32,))]):
        name = perf.table_name(k, ps, D.Distribution.UNIFORM, 4096)
        if not done(name):
            path = perf.perf_test(METHODS + ["rank"], 4096, k, ps,
                                  D.Distribution.UNIFORM, reps=64, warmups=2)
            print("wrote", path, flush=True)

    # ---- scaling sweeps (perfTestNum family) ----------------------------
    sweeps = [(np.int32, (np.int32,)), (np.uint64, (np.uint64,)),
              (np.uint8, ())] if args.full else [(np.int32, (np.int32,))]
    for k, ps in sweeps:
        nm = ("tpe-" + "-".join([perf.common.type_name(k)]
                                + [perf.common.type_name(p) for p in ps]
                                + [D.Distribution.UNIFORM.value]) + ".dat")
        if done(nm):
            print("skip", nm, flush=True)
            continue
        meths = [m for m in METHODS if m not in ("seq", "torch")] \
            if args.full else METHODS
        # reps MUST follow the pipelined protocol (reps=None): at fixed
        # small rep counts the ~1-2 ms dispatch floor dominates every
        # large-n cell (measured 51 vs 1.2 ns/elem at 2^18 with reps=3)
        path = perf.perf_test_num(meths, k, ps,
                                  max_num=1 << (22 if args.full else 18),
                                  reps=None if args.full else 3,
                                  warmups=1)
        print("wrote", path, flush=True)

    # ---- tuning-knob sweeps ---------------------------------------------
    for k, ps in ([(np.int32, (np.int32,)), (np.uint64, (np.uint64,)),
                   (np.uint8, ())] if args.full
                  else [(np.int32, (np.int32,))]):
        nm = ("digits-" + "-".join([perf.common.type_name(k)]
                                   + [perf.common.type_name(p) for p in ps]
                                   + [D.Distribution.UNIFORM.value,
                                      str(args.n)]) + ".dat")
        if done(nm):
            print("skip", nm, flush=True)
        else:
            path = perf.perf_test_block(args.n, k, ps)
            print("wrote", path, flush=True)

    # quicksort threshold sweep (perfTestThresh / perf-paper.cpp role)
    for k, ps in (QUICK_COMBOS if args.full
                  else [(np.int32, (np.int32,))]):
        nm = ("thresh-quick-"
              + "-".join([perf.common.type_name(k)]
                         + [perf.common.type_name(p) for p in ps]
                         + [D.Distribution.UNIFORM.value,
                            str(args.n)]) + ".dat")
        if done(nm):
            print("skip", nm, flush=True)
        else:
            path = perf.perf_test_thresh(args.n, k, ps)
            print("wrote", path, flush=True)

    # ---- quicksort study (perf-paper.cpp:22-115) ------------------------
    if args.full:
        for k, ps in QUICK_COMBOS:
            for dist in DISTS:
                name = "quickstudy-" + perf.table_name(k, ps, dist, args.n)
                if done(name):
                    print("skip", name, flush=True)
                    continue
                path = perf.perf_test(QUICK_METHODS, args.n, k, ps, dist,
                                      reps=None, warmups=1, out_name=name)
                print("wrote", path, flush=True)

    # ---- pairwise speedup across payload-size factors -------------------
    if not done(f"speedup-xla-vs-radix-Uniform-{args.n}.dat"):
        path = perf.perf_test_speedup("xla", "radix", args.n,
                                      reps=None if args.full else 3,
                                      warmups=1)
        print("wrote", path, flush=True)
    if args.full and not done(f"speedup-quick-vs-radix-Uniform-{args.n}.dat"):
        path = perf.perf_test_speedup("quick", "radix", args.n,
                                      reps=None, warmups=1)
        print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
