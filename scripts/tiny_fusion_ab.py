"""Same-epoch A/B for the tiny-range counting-path fusion (round 5).

Chip epochs on this host drift 10-30% between sessions (LOSING_TRACE_r04
vs _r05 show unchanged code moving 0.52 -> 0.57), so the fusion claim is
measured as an INTERLEAVED A/B in one epoch: each repetition cycles
through all schedules before repeating, and the per-schedule statistic is
the median across cycles.

Schedules (int32 keys, Zero and ZeroOne at n = 2^18, device time via the
losing_trace chained-scan protocol — zero dispatch):

  A. 3-launch (rounds 1-4): jnp.min/max pass -> 16-bucket Pallas
     histogram -> Pallas run fill (reconstructed inline; this was
     counting.sort_keys until round 5).
  B. 2-launch: fused minmax_hist16 (one stats pass) -> run fill.
  C. 1-launch (shipped): tiny_sort16 — stats + paint phases in ONE
     sequential Pallas grid.
  D. xla comparison sort (the non-counting reference point).

Writes TINY_FUSION_r05.json.
"""

import json
import os
import sys

from benchlib import jax, np, timeit  # noqa: F401
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from simd_radix_sort_tpu.ops import pallas_hist  # noqa: E402
from simd_radix_sort_tpu.utils import data as D  # noqa: E402
from simd_radix_sort_tpu.utils import transforms  # noqa: E402

N = 1 << 18
# 256-iter chains x 10 pipelined reps: the round-5 protocol fix — shorter
# chains under-amortize the final host fence, which alone reads ~0.5
# ns/elem at 2^18 (the identity control below measures the residual floor)
ITERS = 256
REPS = 10
CYCLES = 5


def three_launch(u):
    """The pre-round-5 tiny path, reconstructed: separate min/max pass,
    separate histogram launch, separate fill launch."""
    lo = jnp.min(u)
    offsets = (u - lo).astype(jnp.int32)
    hist = pallas_hist.histogram(offsets, 16)
    return pallas_hist.fill_runs(hist, u.shape[0], lo.astype(jnp.int32),
                                 u.dtype)


def two_launch(u):
    """minmax_hist16 (fused stats) + fill."""
    mn, mx, hist_mod = pallas_hist.minmax_hist16(u)
    rot = ((mn + jnp.arange(16, dtype=jnp.uint32))
           & jnp.uint32(15)).astype(jnp.int32)
    hist = jnp.take(hist_mod, rot)
    return pallas_hist.fill_runs(hist, u.shape[0],
                                 jax.lax.bitcast_convert_type(mn, jnp.int32),
                                 u.dtype)


def one_launch(u):
    return pallas_hist.tiny_sort16(u)[0]


def xla_sortu(u):
    return jax.lax.sort((u,), num_keys=1)[0]


def chained(fn):
    def run(u):
        def body(c, _):
            x = u ^ (c & jnp.uint32(1))
            out = fn(x)
            return out[0] & jnp.uint32(1), None

        c, _ = jax.lax.scan(body, jnp.uint32(0), None, length=ITERS)
        return c

    return jax.jit(run)


def main():
    report = {"n": N, "iters": ITERS, "reps": REPS, "cycles": CYCLES,
              "protocol": __doc__.strip().split("\n")[0], "cells": {}}
    scheds = {"identity_floor": lambda u: u,
              "3launch": three_launch, "2launch": two_launch,
              "1launch": one_launch, "xla": xla_sortu}
    for dist, dd in (("Zero", D.Distribution.ZERO),
                     ("ZeroOne", D.Distribution.ZERO_ONE)):
        keys = D.make_keys(N, np.int32, dd, seed=11)
        (u,) = transforms.key_operands(jnp.asarray(keys), True)
        fns = {name: chained(fn) for name, fn in scheds.items()}
        # correctness gate before timing (the identity control is the
        # floor measurement, not a sort)
        want = np.sort(np.asarray(u))
        for name, fn in scheds.items():
            if name == "identity_floor":
                continue
            got = np.asarray(jax.jit(fn)(u))
            assert np.array_equal(got, want), f"{name} wrong on {dist}"
        samples = {name: [] for name in scheds}
        for c in range(CYCLES):
            for name, f in fns.items():
                t = timeit(f, [u], reps=REPS, warmup=1 if c == 0 else 0)
                samples[name].append(t / ITERS / N * 1e9)
        cell = {}
        for name in scheds:
            v = np.array(samples[name])
            cell[name] = {"median_ns_per_elem": round(float(np.median(v)), 3),
                          "min_ns_per_elem": round(float(v.min()), 3),
                          "runs": [round(float(x), 3) for x in v]}
        cell["speedup_1launch_vs_3launch_median"] = round(
            cell["3launch"]["median_ns_per_elem"]
            / cell["1launch"]["median_ns_per_elem"], 3)
        report["cells"][f"int32-{dist}"] = cell
        print(f"int32-{dist}: " + "  ".join(
            f"{n2} {cell[n2]['median_ns_per_elem']:.3f}"
            for n2 in scheds), flush=True)

    out = os.path.join(os.path.dirname(__file__), "..",
                       "TINY_FUSION_r05.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(f"-> {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
