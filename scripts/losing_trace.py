"""Dispatch-vs-device split for EVERY losing row (VERDICT r03 item 4).

Extends the scripts/u8_trace.py methodology (round 3) from the single
uint8-Uniform cell to all cells where RESULTS.md trails the reference's
published tables: the uint8 family (published RadixSIMD 0.45-0.52
ns/elem vs our dispatched 0.89-1.13) and int32 Zero/ZeroOne (published
BlacherSort 0.12/0.26 vs our dispatched ~1.0).

Two timings per cell and engine:

  * dispatched — the committed-table protocol (reps back-to-back, one
    fence): includes the per-launch floor through the axon tunnel.
  * device     — one jit running the SAME sort ITERS times inside
    `lax.scan`, each iteration's input XOR-perturbed by a bit of the
    previous output so nothing hoists/CSEs.  Per-iteration time is pure
    device compute: zero dispatch.

Engines: `count` (ops/counting.sort_keys — what auto picks for these
cells) and `xla` (the comparison-sort mover) — best device time per cell
is the honest architecture number; the dispatched-device gap is the
tunnel, not the design.  Writes LOSING_TRACE_r04.json; the same-host
reference anchors for these cells come from scripts/ref_perf.py
(REF_HOST.json, now covering all 8 distributions + the vendored
Blacher/Bramas baselines).

Run idle: python scripts/losing_trace.py [--n 262144] [--iters 64]
"""

import argparse
import json
import os
import sys

from benchlib import jax, np, timeit  # noqa: F401  (jax configured there)
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from simd_radix_sort_tpu.ops import counting  # noqa: E402
from simd_radix_sort_tpu.utils import data as D  # noqa: E402
from simd_radix_sort_tpu.utils import transforms  # noqa: E402

CELLS = [
    ("uint8", d) for d in ("Uniform", "Gaussian", "Zero", "ZeroOne",
                           "Sorted", "ReverseSorted", "AlmostSorted",
                           "AlmostReverseSorted")
] + [("int32", "Zero"), ("int32", "ZeroOne")]

DIST = {
    "Uniform": D.Distribution.UNIFORM, "Gaussian": D.Distribution.GAUSSIAN,
    "Zero": D.Distribution.ZERO, "ZeroOne": D.Distribution.ZERO_ONE,
    "Sorted": D.Distribution.SORTED,
    "ReverseSorted": D.Distribution.REVERSE_SORTED,
    "AlmostSorted": D.Distribution.ALMOST_SORTED,
    "AlmostReverseSorted": D.Distribution.ALMOST_REVERSE_SORTED,
}


def chained(fn, iters, dtype):
    """jit(x -> scan of fn, `iters` times on device); fn(x) returns a
    same-shape array.  Bit 0 of the previous output perturbs the next
    input, so every iteration depends on the last."""

    def run(u):
        def body(c, _):
            x = u ^ (c & dtype.type(1))
            out = fn(x)
            return out[0] & dtype.type(1), None

        c, _ = jax.lax.scan(body, dtype.type(0), None, length=iters)
        return c

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 18)
    # round-5 protocol fix: at iters=64/reps=3 (rounds 3-4) the ONE host
    # fence amortized over so little device work that the "device" column
    # carried a ~0.5 ns/elem floor — measured directly: the chained
    # IDENTITY function read 0.52-0.56 ns/elem at 2^18.  256-iteration
    # chains x 10 pipelined reps shrink the floor to ~0.05 ns/elem
    # (TINY_FUSION_r05.json carries the floor measurement).
    ap.add_argument("--iters", type=int, default=256)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--dev-reps", type=int, default=10)
    args = ap.parse_args()
    n, iters = args.n, args.iters
    report = {"n": n, "iters": iters, "protocol": __doc__.split("\n")[0],
              "protocol_note": (
                  "round-5 fix: device leg uses 256-iter chains x 10 reps; "
                  "the r03/r04 64x3 protocol under-amortized the final host "
                  "fence, inflating every device cell by a ~0.5 ns/elem "
                  "floor (identity-function control committed in "
                  "TINY_FUSION_r05.json)"),
              "cells": {}}

    for dt_name, dist in CELLS:
        dtype = np.dtype(dt_name)
        keys = D.make_keys(n, dtype, DIST[dist], seed=11)
        u = jnp.asarray(keys)
        cell = {}
        engines = {
            "count": lambda x: counting.sort_keys(x, True)[0],
            "xla": lambda x: transforms.keys_from_operands(
                tuple(jax.lax.sort(
                    transforms.key_operands(x, True), num_keys=1)),
                dtype, True),
        }
        for eng, fn in engines.items():
            disp = timeit(jax.jit(fn), [u], reps=args.reps, warmup=2)
            dev = timeit(chained(fn, iters, dtype), [u],
                         reps=args.dev_reps, warmup=1) / iters
            cell[eng] = {
                "dispatched_ns_per_elem": round(disp / n * 1e9, 3),
                "device_ns_per_elem": round(dev / n * 1e9, 3),
                "dispatch_overhead_us": round((disp - dev) * 1e6, 1),
            }
        best_eng = min(cell, key=lambda e: cell[e]["device_ns_per_elem"])
        cell["best_device_ns_per_elem"] = \
            cell[best_eng]["device_ns_per_elem"]
        cell["best_engine"] = best_eng
        report["cells"][f"{dt_name}-{dist}"] = cell
        print(f"{dt_name}-{dist:22s} " + "  ".join(
            f"{e}: disp {cell[e]['dispatched_ns_per_elem']:6.3f} dev "
            f"{cell[e]['device_ns_per_elem']:6.3f} ns/elem"
            for e in engines), flush=True)

    noop = jax.jit(lambda x: x[:1] ^ jnp.uint8(1))
    u8 = jnp.zeros(n, jnp.uint8)
    report["noop_dispatch_floor_us"] = round(
        timeit(noop, [u8], reps=args.reps, warmup=2) * 1e6, 1)

    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "LOSING_TRACE_r05.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(f"-> {os.path.abspath(out_path)}")


if __name__ == "__main__":
    main()
