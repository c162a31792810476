"""Headline MFU attack (round-1 VERDICT item 6): batched leaves + best
available recombination, measured end-to-end vs one lax.sort at 1e8 rows.

The hypothesis worth killing (or confirming): (C, 8192) batched leaf sorts
run ~4.5x cheaper per element than the full sort, so IF a recombination
existed that costs less than (full - leaves), the headline would move.
This script measures, with runnable code:

  1. the full-sort baseline (the shipped headline path);
  2. the batched-leaf pass alone (the available headroom);
  3. leaves + XLA full sort (sanity: XLA's oblivious network cannot
     exploit pre-sorted runs, so this must cost leaves + baseline);
  4. ONE strided-elementwise bitonic merge stage at full width (min/max
     on static-stride reshapes — the only gather-free merge primitive),
     to anchor the per-stage HBM cost that a leaves->merge-network
     recombination would pay ~230-300 times.

Conclusion math is printed at the end; results are appended to
DESIGN_NOTES.md by hand (keep the numbers and the code together).

Run idle: JAX_ENABLE_X64=1 python scripts/mfu_attack.py [--n 100000000]
"""

import argparse

from benchlib import jax, np, timeit  # noqa: F401  (jax configured there)
import jax.numpy as jnp

LEAF = 8192


def bitonic_merge_stage(streams, dist: int, n: int):
    """One compare-exchange stage at distance `dist` over 2*dist-wide
    groups: static-stride reshape + min/max + interleave — no gathers.
    Keys are the first two streams (hi, lo lexicographic); payload
    streams swap with their keys."""
    g = n // (2 * dist)
    mats = [s.reshape(g, 2, dist) for s in streams]
    a = [m[:, 0, :] for m in mats]
    b = [m[:, 1, :] for m in mats]
    a_le = (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] <= b[1]))
    lo = [jnp.where(a_le, x, y) for x, y in zip(a, b)]
    hi = [jnp.where(a_le, y, x) for x, y in zip(a, b)]
    return [jnp.stack([x, y], axis=1).reshape(n)
            for x, y in zip(lo, hi)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    args = ap.parse_args()
    n = (args.n // (2 * LEAF)) * (2 * LEAF)  # merge stages need 2*LEAF groups
    c = n // LEAF
    rng = np.random.default_rng(2)
    streams = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
               for _ in range(4)]  # key (hi, lo) + payload (hi, lo)

    full = jax.jit(lambda *s: jax.lax.sort(s, num_keys=2))
    dt_full = timeit(full, streams)
    print(f"full lax.sort [u64,u64]            {n/dt_full/1e6:8.1f} Mrows/s")

    leaves = jax.jit(lambda *s: jax.lax.sort(
        tuple(x.reshape(c, LEAF) for x in s), dimension=1, num_keys=2))
    dt_leaf = timeit(leaves, streams)
    print(f"batched leaves (C,{LEAF})           {n/dt_leaf/1e6:8.1f} Mrows/s")

    # leaves + full sort of the leaf output (flattened)
    leaves_then_full = jax.jit(lambda *s: jax.lax.sort(
        tuple(x.reshape(n) for x in jax.lax.sort(
            tuple(y.reshape(c, LEAF) for y in s), dimension=1,
            num_keys=2)), num_keys=2))
    dt_ltf = timeit(leaves_then_full, streams)
    print(f"leaves + full sort                 {n/dt_ltf/1e6:8.1f} Mrows/s"
          f"  (oblivious network cannot reuse runs)")

    one_stage = jax.jit(lambda *s: tuple(
        bitonic_merge_stage(list(s), LEAF, n)))
    dt_stage = timeit(one_stage, streams)
    levels = int(np.ceil(np.log2(c)))
    # merging sorted runs of size m doubles m per level; level j (run size
    # 2^j) needs j+1 bitonic stages
    stages = sum(int(np.log2(LEAF)) + 1 + j for j in range(levels))
    est = dt_leaf + stages * dt_stage
    print(f"one elementwise merge stage        {dt_stage*1e3:8.1f} ms")
    print(f"merge-network estimate: leaves + {stages} stages = "
          f"{est:.2f} s -> {n/est/1e6:.1f} Mrows/s "
          f"(vs full {n/dt_full/1e6:.1f})")
    verdict = ("REFUTED: leaves+merge cannot beat one lax.sort"
               if est > dt_full else "ATTACK VIABLE — implement the merge")
    print(verdict)


if __name__ == "__main__":
    main()
