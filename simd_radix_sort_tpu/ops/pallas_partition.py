"""Pallas TPU compress-store partition — the `mask_compressstoreu` role, built.

This is the one reference component every prior round carried as "partial":
the AVX-512 masked compress-store (/root/reference/src/simd.hpp:310-389)
that drives the 1-bit partition pass of the reference's radix sort
(/root/reference/src/radix_sort.hpp:109-268).  Rounds 1-3 measured every
bulk-mover family and closed the question by evidence (DESIGN_NOTES:
scatter, gather, merge networks, binned mover + cleanup, MXU lookups all
lose to one variadic `lax.sort`); this module builds the component itself
so the closure is confirmed by the named artifact, not only by argument.

TPU decomposition of a compress-store (the ISA has no scatter and no
unaligned vector store, so the AVX primitive splits into two roles):

  * the IN-REGISTER COMPRESS — within a block of `block` elements, move
    all mask=0 rows stably to the front and mask=1 rows to the back.
    Done in a Pallas kernel with exact f32 MXU matmuls: stable ranks from
    a strict-lower-triangular count matrix, then a one-hot permutation
    matmul (the same scatter-free permute as ops/rank_sort.py).  Every
    store uses a static BlockSpec offset — Mosaic requires dynamic HBM
    offsets to be tile-aligned, which arbitrary partition boundaries are
    not (same constraint that shaped ops/pallas_hist.fill_runs).

  * the UNALIGNED STORE — concatenating the per-block left runs, then the
    per-block right runs, at arbitrary element offsets.  No TPU store can
    do this; the destination-driven equivalent is one XLA gather per
    stream over per-block run offsets (searchsorted on the block-count
    prefix sums).

`partition_pass` is the stable two-way partition primitive;
ops/radix.sort_arrays(engine="pallas") chains it LSB->MSB over the key
bits into a full stable binary LSD radix sort — one key bit per pass,
exactly the reference's pass structure, LSD instead of MSB recursion
because XLA needs static shapes.  Expected (and measured — see
DESIGN_NOTES round-4 addendum 2) to lose to the `lax.sort` movers: each
bit pass costs a permute of all streams, and 32-64 bit passes cannot beat
one comparison sort.  The kernel exists as the faithful, tested,
measured form of the reference's partition primitive, and as the
building block for any future partition-shaped op.

Tests run the kernel in interpreter mode on CPU (tests/
test_pallas_partition.py); scripts/partition_bench.py measures it on the
real chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import common, transforms

# Elements per compress block.  The kernel materializes two (block, block)
# f32 matrices (triangular counts + one-hot permutation), so VMEM caps the
# size: 512 -> ~2 MB of (B, B) scratch, comfortably inside 16 MB.
PART_BLOCK = 512


def _partition_kernel(nlanes: int, x_ref, out_ref):
    """Stable in-block two-way compress of one (block, nlanes) tile.

    Lane layout: lanes [0, nlanes-1) carry the element streams as exact
    u16 halves in f32; lane nlanes-1 carries the mask (0.0 = left,
    1.0 = right).  All arithmetic is exact: ranks and counts are integers
    < block <= 2^24, and u16 halves are exact in f32.
    """
    x = x_ref[:]                                   # (B, L) f32
    b = x.shape[0]
    m = x[:, nlanes - 1:nlanes]                    # (B, 1), 0.0/1.0

    # Stable ranks via the MXU: tri[i, j] = 1 iff j < i, so tri @ [1-m, m]
    # counts, for every row, the left/right elements strictly before it.
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    tri = (cols < rows).astype(jnp.float32)
    sides = jnp.concatenate([1.0 - m, m], axis=1)  # (B, 2)
    # Precision.HIGHEST: the MXU's default f32 matmul truncates operands to
    # bf16, which destroys exactness for u16-half values and counts.
    before = jnp.dot(tri, sides, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    left_total = jnp.sum(1.0 - m)
    rank = jnp.where(m > 0.5, left_total + before[:, 1:2], before[:, 0:1])

    # One-hot permutation matmul: out[k] = x[i] where rank[i] == k.
    # P2[i, k] = (rank[i] == k); contracting P2's dim 0 against x's dim 0
    # computes P2^T @ x without materializing a transpose.
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)  # iota must be int
    rank_i = rank.astype(jnp.int32)
    p2 = (jnp.broadcast_to(rank_i, (b, b)) == lane_k).astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        p2, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _halves(s: jax.Array):
    """u32 -> two exact f32 lanes (hi16, lo16)."""
    hi = (s >> jnp.uint32(16)).astype(jnp.float32)
    lo = (s & jnp.uint32(0xFFFF)).astype(jnp.float32)
    return hi, lo


def _from_halves(hi: jax.Array, lo: jax.Array) -> jax.Array:
    return (hi.astype(jnp.uint32) << jnp.uint32(16)) | lo.astype(jnp.uint32)


def _run_sources(lc, vc, block: int, n: int):
    """Destination-driven source indices for the global run concatenation.

    lc[b] = valid left-count of block b, vc[b] = valid rows of block b.
    Output position j reads compacted position src[j]: first all per-block
    left runs in block order, then all per-block right runs.
    """
    nb = lc.shape[0]
    rc = vc - lc
    inc_l = jnp.cumsum(lc, dtype=jnp.int32)
    inc_r = jnp.cumsum(rc, dtype=jnp.int32)
    total_left = inc_l[-1]
    j = jnp.arange(n, dtype=jnp.int32)

    bl = jnp.minimum(jnp.searchsorted(inc_l, j, side="right").astype(jnp.int32),
                     nb - 1)
    src_l = bl * block + (j - (inc_l[bl] - lc[bl]))

    j2 = jnp.maximum(j - total_left, 0)
    br = jnp.minimum(jnp.searchsorted(inc_r, j2, side="right").astype(jnp.int32),
                     nb - 1)
    src_r = br * block + lc[br] + (j2 - (inc_r[br] - rc[br]))

    # NOTE: the unselected branch's index (src_l past the left total /
    # src_r before it) can evaluate out of range (up to n_pad) — safe only
    # because the where picks INDICES before any jnp.take; a refactor that
    # gathers both branches first would silently clip/fill those rows.
    return jnp.where(j < total_left, src_l, src_r)


def partition_pass(streams, mask: jax.Array, *, block: int = PART_BLOCK,
                   interpret: bool = False):
    """Stable two-way partition of lock-step u32 streams by a bool mask.

    All mask=False elements first, then all mask=True, both sides in input
    order — the semantics of one reference partition pass
    (radix_sort.hpp:109-268) over the whole array.  Jittable, static
    shapes.  Returns the partitioned streams as a list of u32 arrays.
    """
    streams = [jnp.asarray(s).astype(jnp.uint32) for s in streams]
    n = streams[0].shape[0]
    nb = -(-n // block)
    n_pad = nb * block
    pad = n_pad - n

    # Padding rows carry mask=1.0 so they compact to every block's tail;
    # the valid-count vector below keeps them out of the gathered output.
    mask_f = jnp.pad(mask.astype(jnp.float32), (0, pad), constant_values=1.0)
    lanes = []
    for s in streams:
        hi, lo = _halves(jnp.pad(s, (0, pad)))
        lanes.extend([hi, lo])
    lanes.append(mask_f)
    x = jnp.stack(lanes, axis=1)                   # (n_pad, L)
    nlanes = len(lanes)

    with jax.enable_x64(False):  # see pallas_hist.histogram
        out = pl.pallas_call(
            functools.partial(_partition_kernel, nlanes),
            grid=(nb,),
            in_specs=[pl.BlockSpec((block, nlanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block, nlanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, nlanes), jnp.float32),
            interpret=interpret,
        )(x)

    # Per-block valid left counts from the padded mask (pads count as right).
    lc = jnp.sum(mask_f.reshape(nb, block) < 0.5, axis=1, dtype=jnp.int32)
    vc = jnp.clip(n - jnp.arange(nb, dtype=jnp.int32) * block, 0, block)
    src = _run_sources(lc, vc, block, n)

    result = []
    for i in range(len(streams)):
        s_comp = _from_halves(out[:, 2 * i], out[:, 2 * i + 1])
        result.append(jnp.take(s_comp, src, axis=0))
    return result


# ---------------------------------------------------------------------------
# u32-word transport for arbitrary payload dtypes (the compress kernel moves
# u32 words; payloads are bit-split on entry and reassembled on exit — the
# analogue of the reference's opaque payload compress-stores).
# ---------------------------------------------------------------------------


def to_words(arr: jax.Array):
    """Bit-split an array into 1 or 2 u32 word streams + reassembly meta."""
    dtype = np.dtype(arr.dtype)
    udtype = common.unsigned_of(dtype)
    u = arr if dtype == udtype else jax.lax.bitcast_convert_type(arr, udtype)
    if dtype.itemsize == 8:
        hi, lo = transforms.split64(u)
        return [hi, lo], (dtype, 2)
    return [u.astype(jnp.uint32)], (dtype, 1)


def from_words(words, meta) -> jax.Array:
    dtype, nwords = meta
    udtype = common.unsigned_of(dtype)
    if nwords == 2:
        u = transforms.merge64(words[0], words[1])
    else:
        u = words[0].astype(udtype)
    return u if dtype == udtype else jax.lax.bitcast_convert_type(u, dtype)
