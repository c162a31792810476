"""Round-3 uint8 small-n attack (VERDICT r02 item 3): split device compute
from dispatch at the reference's n = 2^18 with ON-DEVICE chained loops.

The round-2 claim "0.26 ms at 2^18 is dispatch-bound" was asserted, not
shown.  Here each candidate is measured two ways:

  * dispatched — the bench protocol (reps back-to-back, one fence): what
    the committed tables report.  Includes per-launch overhead through
    the axon tunnel at steady state.
  * device     — a single jit running the SAME sort ITERS times inside
    `lax.scan`, each iteration consuming a carry derived from the last
    output (a 1-bit XOR perturbation, so nothing can be hoisted or
    CSE'd).  Per-iteration time is pure device compute: zero dispatch.

The gap between the two IS the dispatch floor.  Components measured the
same way: MXU histogram (the shipped path), the VPU Pallas histogram,
and the boundary-walk fill.  Writes U8_TRACE_r03.json; also captures a
jax.profiler trace of the dispatched path (artifact dir printed).

Run idle: python scripts/u8_trace.py [--n 262144] [--iters 64]
"""

import argparse
import json
import os

from benchlib import jax, np, timeit  # noqa: F401  (jax configured there)
import jax.numpy as jnp

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from simd_radix_sort_tpu.ops import counting, pallas_hist  # noqa: E402
import simd_radix_sort_tpu as srs  # noqa: E402


def chained(fn, iters):
    """jit(carry -> scan of fn, `iters` times on device).  fn(x) must
    return a uint8 array the same shape as x; the carry XORs bit 0 of the
    next input so every iteration depends on the previous result."""

    def run(u):
        def body(c, _):
            x = u ^ (c & jnp.uint8(1))
            out = fn(x)
            return out[0] & jnp.uint8(1), None

        c, _ = jax.lax.scan(body, jnp.uint8(0), None, length=iters)
        return c

    return jax.jit(run)


def fence_time(fn, args, reps=3):
    return timeit(fn, args, reps=reps, warmup=1)


def parse_xplane(tdir):
    """Sum per-kernel event durations from the newest xplane proto under
    `tdir` (plane -> {event name: total us}), device planes only."""
    import glob

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(
        tdir, "plugins", "profile", "*", "*.xplane.pb"))
    path = max(paths, key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    out = {}
    for plane in space.planes:
        if not any(t in plane.name for t in ("TPU", "/device", "Device")):
            continue
        evs = {}
        for line in plane.lines:
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                evs[name] = evs.get(name, 0.0) + ev.duration_ps / 1e6
        if evs:
            out[plane.name] = evs
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 18)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()
    n, iters = args.n, args.iters
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.integers(0, 256, n, dtype=np.uint8))
    report = {"n": n, "iters": iters, "cells": {}}

    def cell(name, dispatched_s, device_s=None):
        c = {"dispatched_us": round(dispatched_s * 1e6, 1),
             "dispatched_ns_per_elem": round(dispatched_s / n * 1e9, 3)}
        if device_s is not None:
            c["device_us"] = round(device_s * 1e6, 1)
            c["device_ns_per_elem"] = round(device_s / n * 1e9, 3)
            c["dispatch_overhead_us"] = round(
                (dispatched_s - device_s) * 1e6, 1)
        report["cells"][name] = c
        dev = (f"  device {c.get('device_us', '—')} us"
               if device_s is not None else "")
        print(f"{name:28s} dispatched {c['dispatched_us']:8.1f} us"
              f" ({c['dispatched_ns_per_elem']:.3f} ns/elem){dev}",
              flush=True)

    # 1. the shipped u8 sort (auto -> count): dispatched at two rep counts
    sort8 = jax.jit(lambda x: counting.counting_sort_carrier(x, 256, 0))
    dt5 = timeit(sort8, [u], reps=5, warmup=2)
    dt50 = timeit(sort8, [u], reps=50, warmup=2)
    cell("sort_u8 reps=5", dt5)
    cell("sort_u8 reps=50", dt50)

    # 2. the same sort chained on device
    dev_sort = chained(lambda x: counting.counting_sort_carrier(x, 256, 0),
                       iters)
    dt_dev = fence_time(dev_sort, [u]) / iters
    cell("sort_u8", dt50, dt_dev)

    # 3. components, chained on device
    def mxu_only(x):
        h = counting.mxu_histogram(x.astype(jnp.int32), 256)
        return (h[:1] & 1).astype(jnp.uint8)  # consume

    dev_mxu = chained(lambda x: mxu_only(x), iters)
    cell("mxu_histogram", fence_time(jax.jit(mxu_only), [u], reps=10),
         fence_time(dev_mxu, [u]) / iters)

    def vpu_only(x):
        h = pallas_hist.histogram(x.astype(jnp.int32), 256)
        return (h[:1] & 1).astype(jnp.uint8)

    dev_vpu = chained(lambda x: vpu_only(x), iters)
    cell("vpu_histogram", fence_time(jax.jit(vpu_only), [u], reps=10),
         fence_time(dev_vpu, [u]) / iters)

    hist = jax.device_get(jax.jit(
        lambda x: counting.mxu_histogram(x.astype(jnp.int32), 256))(u))
    hist_j = jnp.asarray(hist)

    def fill_only(x):
        # consume x so the chain is honest; hist is constant
        h = hist_j.at[0].add((x[0] & 1).astype(jnp.int32))
        out = pallas_hist.fill_runs(h, n, 0, jnp.uint8)
        return out

    dev_fill = chained(fill_only, iters)
    cell("fill_runs", fence_time(jax.jit(fill_only), [u], reps=10),
         fence_time(dev_fill, [u]) / iters)

    # 4. empty-program floor: the cheapest possible dispatched program
    noop = jax.jit(lambda x: x[:1] ^ jnp.uint8(1))
    cell("noop dispatch floor", timeit(noop, [u], reps=50, warmup=2))

    # 5. profiler trace artifact of the dispatched path, with a parsed
    # per-kernel breakdown (xplane protos; tensorflow is baked in)
    tdir = "/tmp/srs_u8_trace"
    with jax.profiler.trace(tdir):
        for _ in range(10):
            out = sort8(u)
        np.asarray(out.ravel()[:1])
    report["trace_dir"] = tdir
    try:
        report["trace_planes"] = parse_xplane(tdir)
        for plane, evs in report["trace_planes"].items():
            print(f"  [{plane}]")
            for name, us in sorted(evs.items(), key=lambda kv: -kv[1])[:12]:
                print(f"    {us:10.1f} us  {name[:70]}")
    except Exception as e:  # trace schema varies by backend — keep the raw dir
        report["trace_parse_error"] = repr(e)
        print(f"trace parse failed: {e!r}")
    print(f"profiler trace -> {tdir}")

    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "U8_TRACE_r03.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {os.path.abspath(out_path)}")


if __name__ == "__main__":
    main()
