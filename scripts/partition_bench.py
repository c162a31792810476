"""Measure the Pallas compress-store partition on the real chip.

Produces PARTITION_PALLAS_r04.json: the per-pass cost of the
mask_compressstoreu analogue (ops/pallas_partition.py) and the end-to-end
cost of the bit-LSD radix sort built on it (ops/radix.sort_arrays
engine="pallas"), against the shipped lax.sort mover on the same shapes.

Pre-registered expectation (DESIGN_NOTES rounds 1-3 closure): the bit-pass
engine LOSES — each pass permutes every stream and a w-bit key needs w
passes, so it cannot beat one comparison sort.  This run turns that
argument into the named component's own measured number.

Usage: python scripts/partition_bench.py [--n 4194304] [--out FILE]
"""

import argparse
import json
import time

import benchlib  # noqa: F401  (jax config: x64 + compile cache)
import jax
import jax.numpy as jnp
import numpy as np

from simd_radix_sort_tpu.ops import pallas_partition as pp
from simd_radix_sort_tpu.ops import radix


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 22)
    ap.add_argument("--n-sort", type=int, default=1 << 20,
                    help="n for the full bit-LSD sort (32/64 passes)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="PARTITION_PALLAS_r04.json")
    args = ap.parse_args()

    dev = jax.devices()[0]
    rng = np.random.default_rng(42)
    rec = {"device": str(dev), "n_pass": args.n, "n_sort": args.n_sort,
           "block": pp.PART_BLOCK, "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}

    # --- single partition pass, [u64 key, u64 payload] transport:
    # 4 u32 streams + mask, the headline row shape ---
    streams = [jnp.asarray(rng.integers(0, 2**32, args.n, dtype=np.uint32))
               for _ in range(4)]
    mask = jnp.asarray(rng.integers(0, 2, args.n).astype(bool))

    @jax.jit
    def one_pass(s0, s1, s2, s3, m):
        return tuple(pp.partition_pass([s0, s1, s2, s3], m))

    # correctness gate on-device before timing
    got = one_pass(*streams, mask)
    order = np.argsort(np.asarray(mask), kind="stable")
    for g, s in zip(got, streams):
        assert np.array_equal(np.asarray(g), np.asarray(s)[order]), \
            "on-device partition does not match the stable oracle"
    rec["pass_validated"] = True

    t = benchlib.timeit(one_pass, (*streams, mask), reps=args.reps)
    rec["pass_s"] = t
    rec["pass_ns_per_elem"] = t / args.n * 1e9

    # --- full sorts at n_sort: bit-LSD pallas engine vs the shipped
    # lax.sort mover, u32 keys + u32 payload (32 bit passes) ---
    keys = jnp.asarray(rng.integers(0, 2**32, args.n_sort, dtype=np.uint32))
    pay = jnp.asarray(rng.integers(0, 2**32, args.n_sort, dtype=np.uint32))

    def run(engine):
        f = jax.jit(lambda k, p: radix.sort_arrays(k, (p,), engine=engine))
        k_out, (p_out,) = f(keys, pay)
        # validate against the stable oracle (keys AND payload co-movement
        # AND stability), same standard as the single-pass check above
        order = np.argsort(np.asarray(keys), kind="stable")
        assert np.array_equal(np.asarray(k_out), np.asarray(keys)[order]), \
            f"{engine}: keys do not match the stable oracle"
        assert np.array_equal(np.asarray(p_out), np.asarray(pay)[order]), \
            f"{engine}: payload does not match the stable oracle"
        return benchlib.timeit(f, (keys, pay), reps=args.reps)

    t_pallas = run("pallas")
    t_sort = run("sort")
    rec["sort_validated"] = True
    rec["bitlsd_pallas_s"] = t_pallas
    rec["bitlsd_pallas_ns_per_elem"] = t_pallas / args.n_sort * 1e9
    rec["laxsort_mover_s"] = t_sort
    rec["laxsort_mover_ns_per_elem"] = t_sort / args.n_sort * 1e9
    rec["pallas_vs_laxsort_ratio"] = t_pallas / t_sort

    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
