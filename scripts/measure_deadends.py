"""Reproduce every measured number in DESIGN_NOTES.md's primitive table.

Round-1 VERDICT item 3: the dead-end catalog behind the architecture was
committed as prose; this script is the runnable backing.  Each experiment
prints one line `name measured unit (DESIGN_NOTES claim)` so the table can
be re-checked after any Mosaic/XLA upgrade.

Run on the real TPU with the chip otherwise idle:
    JAX_ENABLE_X64=1 python scripts/measure_deadends.py [--n 100000000]

Timing protocol: pipelined reps, ONE fence (see BENCH_NOTES.md) — per-rep
syncs measure the axon tunnel, not the chip.
"""

import argparse
import time

from benchlib import fence as _fence, jax, np, timeit  # noqa: F401
import jax.numpy as jnp


def report(name, rate, unit, claim):
    print(f"{name:44s} {rate:12.1f} {unit}  (claim: {claim})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    args = ap.parse_args()
    n = args.n
    rng = np.random.default_rng(0)

    # --- full variadic sort [u64,u64] -> (hi,lo) u32 path ----------------
    kh = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    kl = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    ph = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    pl = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    f = jax.jit(lambda a, b, c, d: jax.lax.sort((a, b, c, d), num_keys=2))
    dt = timeit(f, (kh, kl, ph, pl), reps=3)
    report("lax.sort full [u64,u64] (hi,lo words)", n / dt / 1e6,
           "Mrows/s", "122-148")

    # --- batched (C, 8192) sorts ----------------------------------------
    c = n // 8192
    m = c * 8192
    f = jax.jit(lambda a, b, p, q: jax.lax.sort(
        (a.reshape(c, 8192), b.reshape(c, 8192), p.reshape(c, 8192),
         q.reshape(c, 8192)), dimension=1, num_keys=2))
    dt = timeit(f, (kh[:m], kl[:m], ph[:m], pl[:m]), reps=3)
    report("lax.sort batched (C,8192) [u64,u64]", m / dt / 1e6,
           "Melem/s", "559")
    f = jax.jit(lambda a, p: jax.lax.sort(
        (a.reshape(c, 8192), p.reshape(c, 8192)), dimension=1, num_keys=1))
    dt = timeit(f, (kh[:m], ph[:m]), reps=3)
    report("lax.sort batched (C,8192) [u32,u32]", m / dt / 1e6,
           "Melem/s", "717")

    # --- random gather / scatter ----------------------------------------
    ng = min(n, 30_000_000)
    idx = jnp.asarray(rng.permutation(ng).astype(np.int32))
    src = kh[:ng]
    f = jax.jit(lambda s, i: jnp.take(s, i))
    dt = timeit(f, (src, idx), reps=3)
    report("XLA gather random u32", ng / dt / 1e6, "Melem/s", "76")

    f = jax.jit(lambda s, i: jnp.zeros_like(s).at[i].set(
        s, unique_indices=True))
    dt = timeit(f, (src, idx), reps=3)
    report("XLA scatter unique u32", ng / dt / 1e6, "Melem/s", "107")

    cg = ng // 8192
    mg = cg * 8192
    widx = jnp.asarray(
        rng.integers(0, 8192, mg, dtype=np.int32).reshape(cg, 8192))
    f = jax.jit(lambda s, i: jnp.take_along_axis(s.reshape(cg, 8192), i,
                                                 axis=1))
    dt = timeit(f, (src[:mg], widx), reps=3)
    report("XLA gather windowed (C,8192)", mg / dt / 1e6, "Melem/s", "68")

    # --- repeat (expansion) ---------------------------------------------
    nr = min(n, 30_000_000)
    counts = jnp.asarray(np.full(nr // 4, 4, np.int32))
    f = jax.jit(lambda c: jnp.repeat(c, c, total_repeat_length=nr))
    dt = timeit(f, (counts,), reps=3)
    report("jnp.repeat expansion", nr / dt / 1e6, "Melem/s", "118")

    # --- effective HBM bandwidth (chained x+1) --------------------------
    big = kh  # 4 bytes/elem
    f = jax.jit(lambda x: ((x + 1) + 1) + 1)  # 3 chained passes r+w
    dt = timeit(f, (big,), reps=5)
    # XLA fuses the chain into ONE pass: 1 read + 1 write of 4 B each
    gb = n * 4 * 2 / dt / 1e9
    report("effective HBM BW (fused elementwise)", gb, "GB/s", "~180")

    # --- dispatch floor --------------------------------------------------
    tiny = kh[:128]
    f = jax.jit(lambda x: x + 1)
    out = f(tiny)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(tiny)
        _fence(out)  # deliberate per-rep fence: measures the tunnel floor
    dt = (time.perf_counter() - t0) / 20
    report("per-dispatch floor (fenced)", dt * 1e3, "ms", "~1-2")

    # --- u8 counting sort (shipped engine) ------------------------------
    from simd_radix_sort_tpu.ops import counting
    k8 = jnp.asarray(rng.integers(0, 256, n, dtype=np.uint8))
    f = jax.jit(lambda k: counting.sort_keys(k)[0])
    dt = timeit(f, (k8,), reps=3)
    report("u8 keys-only counting sort", n / dt / 1e6, "Melem/s",
           "1740-1980")


if __name__ == "__main__":
    main()
