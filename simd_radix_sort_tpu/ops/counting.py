"""Counting / histogram sort for keys-only workloads — the TPU answer to
byte-wise LSD radix on narrow keys.

The reference's own evaluation concedes that its binary radix loses to
byte-histogram radix (Intel IPP) on narrow keys: uint8 0.497 vs 0.226
ns/elem, int16 8.06 vs 3.18 (BASELINE.md; thesis tex:4068-4090).  A TPU has
no per-element scatter worth using, but for KEYS-ONLY sorts no scatter is
needed at all: the sorted output is fully determined by the histogram, and
both the histogram and the expansion are dense vector reductions that XLA
fuses into streaming passes:

    hist[b] = sum_i (v_i == b)            (broadcast compare, fused reduce)
    out[i]  = sum_b (i >= cum_b)          (broadcast compare, fused reduce)

Cost is O(K) lane-ops per element with zero gathers/scatters, so for small K
it runs near memory bandwidth — several times the reference's AVX-512 binary
radix on the same rows.

Two modes:

  * fixed-K: 1-byte keys (u8/i8), K = 256, always applicable.
  * adaptive-range: any integer key <= 32 bit; at runtime computes
    (min, max) of the transformed carrier and, if max - min < K_MAX_RANGE,
    counting-sorts values offset by min; otherwise falls back to the
    comparison sort inside a `lax.cond`.  This is the TPU-native analogue of
    the reference quicksort's adaptive pivot strategy and constant-range
    pruning (/root/reference/src/quick_sort.hpp:296-332): degenerate
    distributions (Zero, ZeroOne, narrow Gaussians) collapse to two cheap
    passes instead of a full sort.

Keys-only is exactly the scope where the reference's strongest competitors
(IPPRadix, BlacherSort) play (src/sort_methods.hpp:270-289, 329-347).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import transforms

# Adaptive-range bucket budget.  The Pallas histogram costs ~2 lane-ops per
# (element, bucket); at K=1024 that is ~2 cycles/element (~490 Melem/s on
# v5e), still ~2x the comparison sort — past this the comparison sort wins.
K_MAX_RANGE = 1024
# The K_MAX_RANGE branch has a flat ~2.5 ns/elem cost while the comparison
# sort grows ~log^2 n from ~1 ns/elem at 2^18 (fresh round-2 tables:
# int32-Gaussian-262144.dat count 2.54 vs xla 0.94 — the 1024-bucket
# branch must NOT engage at the reference's n).  Below this static size
# the adaptive path skips straight from tiny-range to the comparison
# fallback.  methods.COUNT_MIN_N_ADAPTIVE aliases this so the auto
# policy can never route into a band where the branch is compiled out.
SMALL_MIN_N = 1 << 21
# Near-constant fast path (Zero / ZeroOne / small enums): 16 buckets is
# ~0.03 cycles/element.
K_TINY_RANGE = 16
_BLOCK = 1 << 17  # rows per fused compare-reduce step (XLA fallback path)


def _blocked(x: jax.Array):
    """Pad a 1-D array to a multiple of _BLOCK and reshape to (steps, _BLOCK).
    Returns (blocks, original_n)."""
    n = x.shape[0]
    pad = (-n) % _BLOCK
    return jnp.pad(x, (0, pad)).reshape(-1, _BLOCK), n


def _histogram(v: jax.Array, k: int, base: jax.Array) -> jax.Array:
    """hist[b] = #{i < n : v_i - base == b} for b in [0, k).  Values outside
    [base, base+k) and padding rows contribute nothing."""
    blocks, n = _blocked(v)
    o = (blocks - base).astype(jnp.uint32)
    idx = jnp.arange(blocks.size, dtype=jnp.int32).reshape(blocks.shape)
    # clamp out-of-range / padding rows to the dropped bucket k
    o = jnp.where((blocks >= base) & (o < jnp.uint32(k)) & (idx < n),
                  o, jnp.uint32(k))
    buckets = jnp.arange(k + 1, dtype=jnp.uint32)

    def step(acc, blk):
        onehot = blk[:, None] == buckets[None, :]
        return acc + jnp.sum(onehot, axis=0, dtype=jnp.int32), None

    hist, _ = jax.lax.scan(step, jnp.zeros(k + 1, jnp.int32), o)
    return hist[:k]


def _expand(hist: jax.Array, n: int, base: jax.Array, out_dtype) -> jax.Array:
    """Inverse of the histogram: out[i] = base + #{b : cum_b <= i} — the
    sorted carrier sequence."""
    cum = jnp.cumsum(hist, dtype=jnp.int32)  # inclusive prefix counts
    rows, _ = _blocked(jnp.arange(n, dtype=jnp.int32))

    def step(_, blk):
        return None, jnp.sum(blk[:, None] >= cum[None, :], axis=1,
                             dtype=jnp.int32)

    _, out = jax.lax.scan(step, None, rows)
    return (out.reshape(-1)[:n].astype(jnp.uint32)
            + base.astype(jnp.uint32)).astype(out_dtype)


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def mxu_histogram(v: jax.Array, k: int) -> jax.Array:
    """k-bucket histogram via an MXU joint outer product of the value's
    high/low bit halves: hist[a*lo_size + b] = one_hot(v >> s)^T @
    one_hot(v & (lo_size-1)) for k = hi_size * lo_size (powers of two).

    The k per-bucket equality tests of the VPU formulation become a
    (hi_size x lo_size) bf16 matmul accumulation on the MXU (one-hot
    values 0/1 are exact in bf16; f32 accumulation is exact below 2^24
    rows per chunk, i32 across chunks).  Constructing the one-hots
    per-chunk inside the jit keeps the (n, hi/lo_size) operands out of
    HBM — the full-materialization variant measures 4.88 vs the shipped
    8.03 Gelem/s end-to-end at k=256 (scripts/u8_attack.py).  Values
    outside [0, k) are dropped (no bucket matches)."""
    assert k & (k - 1) == 0 and k >= 4, k
    lo_bits = k.bit_length() // 2
    hi_size = k >> lo_bits
    lo_size = 1 << lo_bits
    x = v.astype(jnp.int32)
    iota_hi = jnp.arange(hi_size, dtype=jnp.int32)
    iota_lo = jnp.arange(lo_size, dtype=jnp.int32)
    n = x.shape[0]
    # bound the materialized one-hot chunk to ~128 MB total
    chunk = max(1 << 12, min(1 << 23, (1 << 25) // max(hi_size, lo_size)))
    acc = jnp.zeros((hi_size, lo_size), jnp.int32)
    for s in range(0, max(n, 1), chunk):
        part = x[s:s + chunk]
        oh_hi = (part[:, None] >> lo_bits
                 == iota_hi[None, :]).astype(jnp.bfloat16)
        oh_lo = (part[:, None] & (lo_size - 1)
                 == iota_lo[None, :]).astype(jnp.bfloat16)
        # drop out-of-range values: their hi one-hot row is all zero
        h = jnp.einsum("ni,nj->ij", oh_hi, oh_lo,
                       preferred_element_type=jnp.float32)
        acc = acc + h.astype(jnp.int32)
    return acc.reshape(k)


def mxu_histogram_256(v: jax.Array) -> jax.Array:
    """256-bucket histogram (the u8 path) — see mxu_histogram."""
    return mxu_histogram(v, 256)


def counting_sort_carrier(u: jax.Array, k: int, base) -> jax.Array:
    """Sort an unsigned carrier array whose values all lie in
    [base, base + k) — a histogram pass and an expansion pass, no data
    movement.  On TPU both passes are the Pallas kernels in pallas_hist.py;
    elsewhere the fused-XLA formulation below."""
    base = jnp.asarray(base, u.dtype)
    if _use_pallas():
        from . import pallas_hist
        offsets = (u - base).astype(jnp.int32)  # in [0, k) by contract
        if k >= 256:
            hist = mxu_histogram(offsets, k)  # MXU path (see above)
        else:
            # tiny K: a 4xK matmul wastes the MXU; the VPU accumulator
            # is already ~memory-bound
            hist = pallas_hist.histogram(offsets, k)
        return pallas_hist.fill_runs(hist, u.shape[0],
                                     base.astype(jnp.int32), u.dtype)
    hist = _histogram(u, k, base)
    return _expand(hist, u.shape[0], base, u.dtype)


def sort_keys(keys: jax.Array, ascending: bool = True, key_dtype=None):
    """Keys-only sort via counting (1-byte dtypes) or adaptive range
    counting with comparison-sort fallback (2/4-byte integer dtypes)."""
    dtype = np.dtype(key_dtype) if key_dtype is not None else np.dtype(keys.dtype)
    if keys.shape[0] == 0:
        return keys, ()
    (u,) = transforms.key_operands(keys, ascending, key_dtype)

    # NOTE a fixed 65536-bucket path for 2-byte keys was measured and
    # rejected: the run fill's per-boundary painting is O(K * BLOCK) once
    # boundaries outnumber output blocks, leaving it 2.3x behind the
    # comparison sort even at n=1e8 (0.27 vs 0.61 Gelem/s) — see
    # DESIGN_NOTES.md.  2-byte keys use the adaptive path below.
    if dtype.itemsize == 1:
        out = counting_sort_carrier(u, 256, 0)
    elif _use_pallas():
        from . import pallas_hist
        # The tiny-range path (Zero/ZeroOne/small enums) is ONE kernel
        # launch (pallas_hist.tiny_sort16): a two-phase sequential grid
        # streams the data once for (min, max, residue histogram), then
        # paints the sorted output — replacing the three separate launches
        # of rounds 1-4 (min/max pass, histogram pass, run fill) whose
        # per-launch overhead dominated the 1 MB working set at n=2^18
        # (LOSING_TRACE_r04).  This is the TPU analogue of BlacherSort's
        # near-free constant-input partition
        # (/root/reference/blacher/avx2sort.h): degenerate inputs cost two
        # streaming passes in one launch, full stop.
        assert K_TINY_RANGE == 16  # the kernel's residue width
        u32 = u.astype(jnp.uint32)
        sorted32, mn, mx = pallas_hist.tiny_sort16(u32)
        rng = mx - mn  # uint32, >= 0

        def tiny(_):
            return sorted32.astype(u.dtype)

        def small(_):
            return counting_sort_carrier(u, K_MAX_RANGE, mn.astype(u.dtype))

        def big(_):
            return jax.lax.sort((u,), num_keys=1)[0]

        # n is static: the K_MAX_RANGE branch only exists in the program
        # when the row count is large enough for flat-cost counting to
        # beat the comparison sort (see SMALL_MIN_N)
        wide = (lambda _: jax.lax.cond(rng < jnp.uint32(K_MAX_RANGE),
                                       small, big, None)) \
            if keys.shape[0] >= SMALL_MIN_N else big
        out = jax.lax.cond(rng < jnp.uint32(K_TINY_RANGE), tiny, wide, None)
    else:
        lo = jnp.min(u)
        rng = jnp.max(u) - lo  # unsigned, >= 0

        def tiny(_):
            # near-constant keys (Zero, ZeroOne, tiny enums): a 16-bucket
            # histogram is ~0.03 cycles/element — essentially two streaming
            # passes at memory speed
            return counting_sort_carrier(u, K_TINY_RANGE, lo)

        def small(_):
            return counting_sort_carrier(u, K_MAX_RANGE, lo)

        def big(_):
            return jax.lax.sort((u,), num_keys=1)[0]

        r32 = rng.astype(jnp.uint32)
        # n is static (see the TPU branch above)
        wide = (lambda _: jax.lax.cond(r32 < jnp.uint32(K_MAX_RANGE),
                                       small, big, None)) \
            if keys.shape[0] >= SMALL_MIN_N else big
        out = jax.lax.cond(r32 < jnp.uint32(K_TINY_RANGE), tiny, wide, None)

    keys_out = transforms.keys_from_operands(
        (out,), key_dtype or keys.dtype, ascending, as_bits=key_dtype is not None)
    return keys_out, ()


def supports(key_dtype, payload_dtypes, n) -> bool:
    """Capability predicate for the method registry: keys-only, integer
    keys up to 32 bits (64-bit carriers split into two operands, which
    counting cannot use), any n."""
    if payload_dtypes:
        return False
    dt = np.dtype(key_dtype)
    return dt.kind in "ui" and dt.itemsize <= 4
