"""LSD radix sort: digit histogram + exclusive scan + stable rank + permute.

TPU-native re-design of the reference's MSB 1-bit compress-store partition
(/root/reference/src/radix_sort.hpp:109-268).  The AVX-512 code partitions by
ONE key bit per pass because `vpcompressstoreu` gives it a cheap in-place
two-way split; on TPU the idiomatic move is a multi-bit digit pass
(SURVEY.md section 7): an 8-bit digit means 8x fewer passes over HBM for u64
keys, and each pass is histogram -> exclusive scan -> stable-rank -> apply
permutation, all expressible as dense vector/matrix ops.

Two movers implement that pass structure (see sort_arrays): the default
delegates each pass's stable reorder to the variadic XLA sort (the only
bulk mover measured near the VPU floor on TPU — random-access scatter runs
~100 Melem/s, see BENCH_NOTES.md), and engine="scatter" keeps the direct
histogram -> exclusive scan -> stable rank -> scatter formulation as the
semantic reference.  The Pallas fast paths live where no reorder is needed
at all (ops/pallas_hist.py, used by the counting sort).

The sort is stable (LSD counting passes are stable), which is strictly
stronger than the reference's unstable MSB sort — any output it produces is
also a valid reference output for the same multiset.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import transforms

# Elements per histogram/rank block.  8-bit digits => 256 buckets (+1 pad
# bucket that keeps padding rows at the tail of every pass).
DEFAULT_BLOCK = 1024


def _digit_passes(num_words: int, word_bits: int, digit_bits: int):
    """Yield (word_index, shift) for LSD order across (lo..hi) words."""
    passes = []
    for w in range(num_words - 1, -1, -1):  # word index 0 = hi word
        for shift in range(0, word_bits, digit_bits):
            passes.append((w, shift))
    return passes


def _pass_dest(digits: jax.Array, n_valid: int, num_buckets: int,
               block: int) -> jax.Array:
    """Destination index of every element under a stable counting sort by
    `digits` (values in [0, num_buckets); padding rows must carry digit
    num_buckets-1 to stay at the tail)."""
    n = digits.shape[0]
    nb = n // block
    d_blocks = digits.reshape(nb, block)
    bucket_ids = jnp.arange(num_buckets, dtype=jnp.int32)

    def hist_step(carry, d_blk):
        onehot = (d_blk[:, None] == bucket_ids[None, :]).astype(jnp.int32)
        return carry + onehot.sum(axis=0, dtype=jnp.int32), None

    hist, _ = jax.lax.scan(hist_step, jnp.zeros(num_buckets, jnp.int32),
                           d_blocks)
    base = jnp.cumsum(hist, dtype=jnp.int32) - hist  # exclusive offsets per bucket

    def rank_step(carry, d_blk):
        onehot = (d_blk[:, None] == bucket_ids[None, :]).astype(jnp.int32)
        prefix = jnp.cumsum(onehot, axis=0, dtype=jnp.int32) - onehot  # exclusive within block
        rank_in_block = jnp.take_along_axis(prefix, d_blk[:, None], axis=1)[:, 0]
        dest_blk = base[d_blk] + carry[d_blk] + rank_in_block
        return carry + onehot.sum(axis=0, dtype=jnp.int32), dest_blk

    _, dest = jax.lax.scan(rank_step, jnp.zeros(num_buckets, jnp.int32),
                           d_blocks)
    return dest.reshape(n)


def _apply_perm(dest: jax.Array, streams):
    """out[dest[i]] = stream[i] for every stream (unique indices)."""
    out = []
    for s in streams:
        o = jnp.zeros_like(s).at[dest].set(s, unique_indices=True,
                                           indices_are_sorted=False)
        out.append(o)
    return tuple(out)


def sort_arrays(keys: jax.Array, payloads, ascending: bool = True,
                stable: bool = True, digit_bits: int | None = None,
                block: int = DEFAULT_BLOCK, key_dtype=None,
                engine: str = "sort", interpret: bool = False):
    """LSD radix sort of keys + lock-step payload streams.  Jittable.

    Three per-pass movers:
      * engine="sort" (default): each digit pass is one stable variadic
        lax.sort keyed on the digit — the only stable bulk mover that runs
        at reasonable bandwidth on TPU (random-access scatter measured
        ~100 Melem/s vs >500 for the vectorized sorts).  16-bit digits by
        default: pass cost is digit-width independent, so fewer passes win.
      * engine="scatter": the histogram -> exclusive scan -> stable rank ->
        scatter formulation below — the direct semantic model of a radix
        pass (and of the reference's partition pass), kept as the
        reference implementation and for differential testing.
      * engine="pallas": the reference's actual pass structure — a 1-bit
        compress-store partition per pass (radix_sort.hpp:109-268), built
        on the Pallas compress kernel (ops/pallas_partition.py), LSD over
        the key bits.  Measured slower than one lax.sort (DESIGN_NOTES
        round-4 addendum 2); kept as the faithful form of the reference
        primitive.  `interpret` runs the kernel under the Pallas
        interpreter (CPU tests).
    """
    if engine == "sort":
        return _sort_arrays_sortpass(keys, payloads, ascending,
                                     digit_bits, key_dtype)
    if engine == "pallas":
        # the bit-LSD engine has no digit width (always 1 bit/pass): a
        # caller passing digit_bits=8 would silently get 1-bit passes
        if digit_bits is not None:
            raise ValueError("engine='pallas' sorts 1 bit per pass; "
                             "digit_bits does not apply (use engine='sort' "
                             "or 'scatter' for multi-bit digits)")
        return _sort_arrays_bitpart(keys, payloads, ascending, key_dtype,
                                    interpret=interpret)
    if engine != "scatter":
        raise ValueError(f"unknown radix engine {engine!r}")
    digit_bits = digit_bits or 8
    n = keys.shape[0]
    kops = list(transforms.key_operands(keys, ascending, key_dtype))
    word_bits = kops[0].dtype.itemsize * 8
    num_buckets = (1 << digit_bits) + 1  # +1 = padding bucket (kept last)

    # Payloads move through the pass permutation untouched (scatter is
    # dtype-agnostic) — the analogue of the reference's opaque payload
    # compress-stores (src/simd.hpp:310-389).
    pl_ops = list(payloads)

    n_pad = max(block, ((n + block - 1) // block) * block)
    pad = n_pad - n
    streams = [jnp.pad(s, (0, pad)) for s in kops + pl_ops]
    is_pad = jnp.arange(n_pad, dtype=jnp.int32) >= n

    for word_idx, shift in _digit_passes(len(kops), word_bits, digit_bits):
        word = streams[word_idx]
        d = (word >> word.dtype.type(shift)).astype(jnp.int32) & (
            (1 << digit_bits) - 1)
        d = jnp.where(is_pad, num_buckets - 1, d)
        dest = _pass_dest(d, n, num_buckets, block)
        streams = list(_apply_perm(dest, streams))
        is_pad = jnp.zeros(n_pad, jnp.bool_).at[dest].set(
            is_pad, unique_indices=True)

    streams = [s[:n] for s in streams]
    keys_out = transforms.keys_from_operands(
        tuple(streams[: len(kops)]), key_dtype or keys.dtype, ascending,
        as_bits=key_dtype is not None)
    return keys_out, tuple(streams[len(kops):])


def _sort_arrays_bitpart(keys, payloads, ascending, key_dtype,
                         interpret: bool = False, part_block: int | None = None):
    """One key bit per pass, LSB->MSB, each pass a stable Pallas
    compress-store partition — the reference's pass structure
    (radix_sort.hpp:109-268) with its MSB recursion flipped to LSD so every
    shape stays static under jit."""
    from . import pallas_partition as pp

    kops = list(transforms.key_operands(keys, ascending, key_dtype))
    word_bits = kops[0].dtype.itemsize * 8
    kop_dtype = kops[0].dtype
    block = part_block or pp.PART_BLOCK

    streams = [k.astype(jnp.uint32) for k in kops]
    pay_meta = []
    for p in payloads:
        words, meta = pp.to_words(jnp.asarray(p))
        pay_meta.append((len(streams), meta))
        streams.extend(words)

    for word_idx, shift in _digit_passes(len(kops), word_bits, 1):
        bit = (streams[word_idx] >> jnp.uint32(shift)) & jnp.uint32(1)
        streams = pp.partition_pass(streams, bit == 1, block=block,
                                    interpret=interpret)

    kops_out = tuple(s.astype(kop_dtype) for s in streams[: len(kops)])
    keys_out = transforms.keys_from_operands(
        kops_out, key_dtype or keys.dtype, ascending,
        as_bits=key_dtype is not None)
    pays_out = tuple(
        pp.from_words(streams[start:start + meta[1]], meta)
        for start, meta in pay_meta)
    return keys_out, pays_out


def _sort_arrays_sortpass(keys, payloads, ascending, digit_bits, key_dtype):
    """LSD digit passes with a stable variadic sort as the per-pass mover."""
    kops = list(transforms.key_operands(keys, ascending, key_dtype))
    word_bits = kops[0].dtype.itemsize * 8
    if digit_bits is None:
        # measured knob sweeps (bench_out/digits-*.dat): pass cost is
        # digit-width independent, so fewer passes win — 16-bit digits
        # for <=32-bit keys (2 passes), full 32-bit words for 64-bit
        # carriers (2 word passes: 4.50 vs 8.18 ns/elem at 16 bits)
        digit_bits = 32 if len(kops) == 2 else 16
    digit_bits = min(digit_bits, word_bits)
    streams = kops + list(payloads)
    mask = kops[0].dtype.type((1 << digit_bits) - 1)
    for word_idx, shift in _digit_passes(len(kops), word_bits, digit_bits):
        d = (streams[word_idx] >> kops[0].dtype.type(shift)) & mask
        out = jax.lax.sort((d,) + tuple(streams), num_keys=1, is_stable=True)
        streams = list(out[1:])
    keys_out = transforms.keys_from_operands(
        tuple(streams[: len(kops)]), key_dtype or keys.dtype, ascending,
        as_bits=key_dtype is not None)
    return keys_out, tuple(streams[len(kops):])
