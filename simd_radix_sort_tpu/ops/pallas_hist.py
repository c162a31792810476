"""Pallas TPU kernels for counting sort: bucket histogram + run-fill.

These are the framework's hot-path equivalents of the reference's AVX-512
bit-partition inner loop (/root/reference/src/radix_sort.hpp:147-176) for the
keys-only narrow-key family, re-designed for the TPU execution model:

  * `histogram` — VPU compare-accumulate over (rows, 128) blocks with one
    (K, 128) lane-parallel accumulator held in VMEM across grid steps.
    2 lane-ops per (element, bucket); measured ~1.8 Gelem/s for K=256 on
    TPU v5e (vs ~0.65 G for the fused-XLA formulation in ops/counting.py).
    MXU one-hot matmul variants were evaluated and rejected: Mosaic cannot
    lower the cross-lane reshapes/batched contractions they need.

  * `fill_runs` — the expansion inverse: writes bucket b's value repeated
    hist[b] times.  Output-driven: each grid step owns one output block,
    broadcasts its prefetched start bucket and paints the few run
    boundaries that fall inside it (total boundary work across the grid is
    O(K), not O(n)).  Chunked-DMA run writes were evaluated and rejected:
    Mosaic requires dynamic HBM slice offsets to be tile-aligned (1024
    elements for int8), which arbitrary run boundaries are not.

Both kernels are shape-static and jittable; tests run them in interpreter
mode on CPU (pltpu.force_tpu_interpret_mode), the benchmark on real TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIST_BLOCK_ROWS = 2048          # rows of 128 lanes per grid step


def _hist_kernel(k: int, x_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    # dtype pinned: under x64, jnp.sum(int32) would promote to int64, which
    # Mosaic cannot lower
    rows = [jnp.sum((x == b).astype(jnp.int32), axis=0, dtype=jnp.int32)
            for b in range(k)]
    acc_ref[:] = acc_ref[:] + jnp.stack(rows, axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def histogram(offsets: jax.Array, k: int, interpret: bool = False) -> jax.Array:
    """hist[b] = #{i : offsets_i == b} for b in [0, k).  `offsets` is int32;
    any value outside [0, k) is ignored (callers clamp padding/out-of-range
    rows to k).  Returns (k,) int32."""
    n = offsets.shape[0]
    if n == 0:
        return jnp.zeros(k, jnp.int32)
    block = HIST_BLOCK_ROWS * 128
    pad = (-n) % block
    x = jnp.pad(offsets, (0, pad), constant_values=np.int32(k)).reshape(-1, 128)
    grid = x.shape[0] // HIST_BLOCK_ROWS
    # trace the kernel with x64 promotion off: Mosaic cannot lower the i64
    # literals/index arithmetic that jax_enable_x64 would otherwise inject
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_hist_kernel, k),
            grid=(grid,),
            in_specs=[pl.BlockSpec((HIST_BLOCK_ROWS, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((k, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((k, 128), jnp.int32)],
            interpret=interpret,
        )(x)
    return jnp.sum(out, axis=1, dtype=jnp.int32)


FILL_BLOCK = 1 << 17  # output elements per fill grid step


def _fill_kernel(k: int, dtype, vblk_ref, cum_ref, base_ref, out_ref):
    """Output-driven expansion: grid step i owns output block
    [i*FILL_BLOCK, (i+1)*FILL_BLOCK).  Its value at offset j is the bucket
    b with cum[b] <= i*FILL_BLOCK + j < cum[b+1].  The per-block start
    bucket is prefetched (vblk_ref); values above it are painted by walking
    the (few) run boundaries that fall inside the block — runs are normally
    much longer than a block, so almost every block is one broadcast store.
    Total boundary work across the whole grid is O(k), not O(n)."""
    i = pl.program_id(0)
    v0 = vblk_ref[i]
    block_start = i * FILL_BLOCK
    idx = jax.lax.broadcasted_iota(jnp.int32, (FILL_BLOCK // 128, 128), 0) * 128 \
        + jax.lax.broadcasted_iota(jnp.int32, (FILL_BLOCK // 128, 128), 1) \
        + block_start

    def paint(state):
        v, out = state
        # positions at or past cum[v+1] belong to bucket >= v+1
        out = jnp.where(idx >= cum_ref[v + 1], out + 1, out)
        return v + 1, out

    def keep_going(state):
        v, _ = state
        return jnp.logical_and(v + 1 < k,
                               cum_ref[v + 1] < block_start + FILL_BLOCK)

    init = jnp.full((FILL_BLOCK // 128, 128), v0, jnp.int32)
    _, vals = jax.lax.while_loop(keep_going, paint, (v0, init))
    out_ref[:] = (vals + base_ref[0]).astype(dtype)


def fill_runs(hist: jax.Array, n: int, base, dtype,
              interpret: bool = False) -> jax.Array:
    """Expand a histogram into the sorted carrier array: the concatenation
    over b of hist[b] copies of (base + b).  Requires sum(hist) == n.
    Returns (n,) of `dtype` (values are base + bucket index)."""
    k = hist.shape[0]
    dtype = jnp.dtype(dtype)
    cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(hist, dtype=jnp.int32)])
    n_pad = max(FILL_BLOCK, ((n + FILL_BLOCK - 1) // FILL_BLOCK) * FILL_BLOCK)
    grid = n_pad // FILL_BLOCK
    # start bucket of each block: #{b : cum[b+1] <= block_start}, summed over
    # the k-sized table — tiny dense compute in XLA
    starts = jnp.arange(grid, dtype=jnp.int32) * FILL_BLOCK
    vblk = jnp.sum(cum[None, 1:] <= starts[:, None], axis=1,
                   dtype=jnp.int32)
    vblk = jnp.minimum(vblk, k - 1)
    base_arr = jnp.asarray([base], jnp.int32)
    with jax.enable_x64(False):  # see histogram()
        out = pl.pallas_call(
            functools.partial(_fill_kernel, k, dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(grid,),
                in_specs=[],
                out_specs=pl.BlockSpec((FILL_BLOCK // 128, 128),
                                       lambda i, *_: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((n_pad // 128, 128), dtype),
            interpret=interpret,
        )(vblk, cum, base_arr)
    return out.reshape(-1)[:n]
