"""64-bit top-k vs full sort at large n (round-1 VERDICT item 10 "done"
criterion: measurably cheaper than the full sort, same results).

Run idle: JAX_ENABLE_X64=1 python scripts/topk_bench.py [--n 100000000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, reps=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    args = ap.parse_args()
    n = args.n
    rng = np.random.default_rng(3)
    keys = jnp.asarray(rng.integers(0, 2**64, n, dtype=np.uint64))
    pay = jnp.asarray(rng.integers(0, 2**64, n, dtype=np.uint64))

    from simd_radix_sort_tpu.ops import topk

    for k in (100, 4000):
        f = jax.jit(lambda kk, pp, k=k: topk.top_k(kk, pp, k=k))
        out = f(keys, pay)
        # correctness vs host oracle
        kk = np.asarray(out[0])
        want = np.sort(np.asarray(keys))[::-1][:k]
        assert np.array_equal(kk, want), k
        dt = timeit(f, (keys, pay))
        print(f"top_k(k={k:5d}) 64-bit blocked    {dt*1e3:9.1f} ms")

    full = jax.jit(lambda kk, pp: topk.top_k(kk, pp, k=8192))
    # full-sort reference: sort everything, take k
    def via_sort(kk, pp):
        from simd_radix_sort_tpu.utils import transforms
        hi, lo = transforms.key_operands(kk, ascending=False)
        out = jax.lax.sort((hi, lo, pp), num_keys=2)
        return out[0][:100]

    f = jax.jit(via_sort)
    dt = timeit(f, (keys, pay))
    print(f"full-sort-then-take reference     {dt*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
