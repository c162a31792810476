"""64-bit top-k vs full sort at large n (round-1 VERDICT item 10 "done"
criterion: measurably cheaper than the full sort, same results).

Run idle: JAX_ENABLE_X64=1 python scripts/topk_bench.py [--n 100000000]
"""

import argparse

from benchlib import jax, np, timeit  # noqa: F401  (jax configured there)
import jax.numpy as jnp


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
