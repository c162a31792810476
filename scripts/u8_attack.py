"""uint8 sort attack experiments (round-1 VERDICT item 3).

The shipped u8 counting sort (Pallas VPU histogram + Pallas run fill) is
pinned at ~1.7-2.0 Gelem/s by the histogram's ~2 lane-ops/(element,
bucket) floor.  Two attack fronts, measured separately and end-to-end:

  A. MXU joint histogram in plain XLA: one-hot the two nibbles to bf16
     (n,16) matrices and einsum('ni,nj->ij') — the 256 per-bucket tests
     become a 16x16 outer-product accumulation on the MXU (bf16 0/1
     values are exact; f32 accumulation is exact below 2^24 per chunk, so
     chunk the batch and add in i32).
  B. Run-fill variants: the Pallas fill's boundary work is O(K), so it
     should be HBM-bound, not the measured ~2.4 G — measure u8 vs i32
     output tiles and a packed-u32 (4 bytes/lane) store variant.

Run with the chip idle: JAX_ENABLE_X64=1 python scripts/u8_attack.py
"""

import argparse

from benchlib import jax, np, timeit  # noqa: F401  (jax configured there)
import jax.numpy as jnp


def mxu_histogram_fullmat(v8: jax.Array) -> jax.Array:
    """CONTRAST variant: builds the full (n, 16) one-hot matrices before
    chunking the einsum — 3.2 GB of HBM traffic at n=1e8 that the shipped
    kernel (counting.mxu_histogram_256, which one-hots per chunk INSIDE
    the loop) never materializes.  Kept to document why per-chunk
    construction matters (measured 4.88 vs 8.03 Gelem/s end-to-end)."""
    v = v8.astype(jnp.int32)
    iota = jnp.arange(16, dtype=jnp.int32)
    oh_hi = (v[:, None] >> 4 == iota[None, :]).astype(jnp.bfloat16)
    oh_lo = (v[:, None] & 15 == iota[None, :]).astype(jnp.bfloat16)
    chunk = 1 << 23
    n = v.shape[0]
    acc = jnp.zeros((16, 16), jnp.int32)
    for s in range(0, n, chunk):
        h = jnp.einsum("ni,nj->ij", oh_hi[s:s + chunk], oh_lo[s:s + chunk],
                       preferred_element_type=jnp.float32)
        acc = acc + h.astype(jnp.int32)
    return acc.reshape(256)


def fill_runs_packed(hist: jax.Array, n: int) -> jax.Array:
    """Experimental u8 run-fill emitting packed u32 words (4 bytes per
    lane): same O(K) boundary painting as pallas_hist.fill_runs but with
    4x fewer stored lanes.  Returns (n,) uint8 via a bitcast view."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = hist.shape[0]
    blk = 1 << 15  # u32 words per grid step = 128K bytes
    nw = n // 4
    assert n % 4 == 0
    cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(hist, dtype=jnp.int32)])
    nw_pad = max(blk, ((nw + blk - 1) // blk) * blk)
    grid = nw_pad // blk
    starts = jnp.arange(grid, dtype=jnp.int32) * blk * 4
    vblk = jnp.minimum(jnp.sum(cum[None, 1:] <= starts[:, None], axis=1,
                               dtype=jnp.int32), k - 1)

    def kernel(vblk_ref, cum_ref, out_ref):
        i = pl.program_id(0)
        v0 = vblk_ref[i]
        word = (jax.lax.broadcasted_iota(jnp.int32, (blk // 128, 128), 0)
                * 128
                + jax.lax.broadcasted_iota(jnp.int32, (blk // 128, 128), 1)
                + i * blk)
        planes = []
        for m in range(4):
            idx = word * 4 + m

            def paint(state, idx=idx):
                v, out = state
                out = jnp.where(idx >= cum_ref[v + 1], out + 1, out)
                return v + 1, out

            def keep_going(state):
                v, _ = state
                return jnp.logical_and(
                    v + 1 < k, cum_ref[v + 1] < (i + 1) * blk * 4)

            init = jnp.full((blk // 128, 128), v0, jnp.int32)
            _, vals = jax.lax.while_loop(keep_going, paint, (v0, init))
            planes.append(vals)
        out_ref[:] = (planes[0] | (planes[1] << 8) | (planes[2] << 16)
                      | (planes[3] << 24))

    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(grid,),
                in_specs=[],
                out_specs=pl.BlockSpec((blk // 128, 128), lambda i, *_: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((nw_pad // 128, 128), jnp.int32),
            interpret=False,
        )(vblk, cum)
    words = out.reshape(-1)[:nw]
    return jax.lax.bitcast_convert_type(
        words.astype(jnp.uint32), jnp.uint8).reshape(-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    args = ap.parse_args()
    n = args.n
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 256, n, dtype=np.uint8)
    k8 = jnp.asarray(keys)
    want_hist = np.bincount(keys, minlength=256).astype(np.int32)

    from simd_radix_sort_tpu.ops import counting, pallas_hist

    # --- baseline: shipped engine ---------------------------------------
    f = jax.jit(lambda k: counting.sort_keys(k)[0])
    dt = timeit(f, (k8,), reps=3)
    print(f"shipped u8 counting sort        {n/dt/1e9:8.2f} Gelem/s")

    # --- histogram variants ---------------------------------------------
    f = jax.jit(lambda k: pallas_hist.histogram(k.astype(jnp.int32), 256))
    got = np.asarray(f(k8))
    assert np.array_equal(got, want_hist)
    dt = timeit(f, (k8,), reps=3)
    print(f"pallas VPU histogram K=256      {n/dt/1e9:8.2f} Gelem/s")

    f = jax.jit(mxu_histogram_fullmat)
    got = np.asarray(f(k8))
    assert np.array_equal(got, want_hist), "MXU histogram wrong"
    dt = timeit(f, (k8,), reps=3)
    print(f"MXU histogram (full one-hots)   {n/dt/1e9:8.2f} Gelem/s")

    f = jax.jit(counting.mxu_histogram_256)  # the SHIPPED kernel
    got = np.asarray(f(k8))
    assert np.array_equal(got, want_hist), "shipped MXU histogram wrong"
    dt = timeit(f, (k8,), reps=3)
    print(f"MXU histogram (shipped/chunked) {n/dt/1e9:8.2f} Gelem/s")

    # --- fill variants ---------------------------------------------------
    hist_d = jnp.asarray(want_hist)
    f = jax.jit(lambda h: pallas_hist.fill_runs(h, n, 0, jnp.uint8))
    got = np.asarray(f(hist_d))
    assert np.array_equal(got, np.sort(keys))
    dt = timeit(f, (hist_d,), reps=3)
    print(f"pallas fill (u8 tiles)          {n/dt/1e9:8.2f} Gelem/s")

    f = jax.jit(lambda h: pallas_hist.fill_runs(h, n, 0, jnp.int32))
    dt = timeit(f, (hist_d,), reps=3)
    print(f"pallas fill (i32 tiles)         {n/dt/1e9:8.2f} Gelem/s")

    f = jax.jit(lambda h: fill_runs_packed(h, n))
    got = np.asarray(f(hist_d))
    assert np.array_equal(got, np.sort(keys)), "packed fill wrong"
    dt = timeit(f, (hist_d,), reps=3)
    print(f"pallas fill (packed u32 words)  {n/dt/1e9:8.2f} Gelem/s")

    # --- end-to-end: shipped MXU hist + pallas fill ----------------------
    def combined(k):
        h = counting.mxu_histogram_256(k.astype(jnp.int32))
        return pallas_hist.fill_runs(h, n, 0, jnp.uint8)

    f = jax.jit(combined)
    got = np.asarray(f(k8))
    assert np.array_equal(got, np.sort(keys))
    dt = timeit(f, (k8,), reps=3)
    print(f"MXU hist + pallas fill e2e      {n/dt/1e9:8.2f} Gelem/s")
    print(f"  (reference AVX-512: 2.01 G; IPP LSD: 4.43 G; "
          f"target >= 2.2 G)")


if __name__ == "__main__":
    main()
