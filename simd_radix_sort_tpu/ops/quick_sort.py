"""Quicksort family: pivot partition primitive + full quicksort engine.

TPU-native counterpart of the reference's quicksort variant
(/root/reference/src/quick_sort.hpp):

  * `partition(keys, payloads, pivot)` — the PartitionerSIMD equivalent
    (quick_sort.hpp:67-235): stable two-way split of key/payload streams
    around a pivot, returning (keys', payloads', split_index, key_min,
    key_max) exactly like PartitionResult (quick_sort.hpp:25-30).  On TPU
    the double-ended compress-store loop becomes one stable variadic sort
    by the 1-bit predicate (a dense, jittable pass); min/max ride along as
    vector reduces.  This is the building block dist_sort's skew handling
    and the filter operator share.

  * `sort_arrays(...)` — the DEVICE quicksort engine (the "quick" registry
    method).  quickRecursion's shape is data-adaptive pivots + partition +
    comparison base case; the TPU-native form of that is a sampled-splitter
    multiway partition (one pivot per pass generalizes to C-1 pivots read
    off an oversampled key sample — the same adaptivity median-of-9 buys
    the reference, quick_sort.hpp:285-294), a single partition pass that
    moves rows by bucket id with the stable variadic sort (the only bulk
    mover near the bandwidth floor on TPU), and a final in-segment sort as
    the CmpSorter base case.  Pass count is key-width INDEPENDENT — the
    adaptive win over fixed-digit LSD radix for 64-bit keys (2 passes vs
    4).  Fully jittable, static shapes.

  * `sort_np(...)` — quickRecursion semantics exactly (quick_sort.hpp:
    296-332): median-of-9 pivots (quick_sort.hpp:285-294), overflow-safe
    interval midpoints (`get_average`, quick_sort.hpp:263-268), the 80/20
    anti-skew strategy toggle (ratio < 0.2 -> switch pivot rule,
    quick_sort.hpp:316-319), and constant-range pruning (skip recursion
    when pivot > smallest / next_val(pivot) < largest, quick_sort.hpp:
    321-330).  Recursion over data-dependent segment boundaries cannot
    live under one static-shape jit, so this model runs on the host (like
    the reference's call tree runs on the CPU); it is the differential
    oracle for the pivot logic and the "quickseq" registry method (the
    reference's QuickSeq baseline role, sort_methods.hpp:100-167).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import transforms

CMP_SORT_THRESHOLD = 16  # reference default (radix_sort.hpp:334-337)


def partition(keys: jax.Array, payloads, pivot, ascending: bool = True):
    """Stable two-way partition around `pivot` (inclusive left side).

    Returns (keys_out, payloads_out, split, kmin, kmax): rows with
    key <= pivot (ascending order sense) precede the rest; `split` is the
    left-side row count; kmin/kmax are the observed key extremes
    (PartitionResult, quick_sort.hpp:25-30).  Jittable, static shapes."""
    if keys.shape[0] == 0:
        # no consistent scalar kmin/kmax exists for an empty partition
        raise ValueError("partition requires at least one row")
    kops = transforms.key_operands(keys, ascending)
    pops = transforms.key_operands(jnp.full((1,), pivot, keys.dtype), ascending)
    if len(kops) == 2:
        hi, lo = kops
        le = (hi < pops[0][0]) | ((hi == pops[0][0]) & (lo <= pops[1][0]))
        # lexicographic extremes of (hi, lo)
        minhi, maxhi = jnp.min(hi), jnp.max(hi)
        minlo = jnp.min(jnp.where(hi == minhi, lo,
                                  np.uint32(0xFFFFFFFF).astype(lo.dtype)))
        maxlo = jnp.max(jnp.where(hi == maxhi, lo, lo.dtype.type(0)))
        min_ops = (minhi.reshape(1), minlo.reshape(1))
        max_ops = (maxhi.reshape(1), maxlo.reshape(1))
    else:
        (u,) = kops
        le = u <= pops[0][0]
        min_ops = (jnp.min(u).reshape(1),)
        max_ops = (jnp.max(u).reshape(1),)
    side = jnp.where(le, jnp.uint32(0), jnp.uint32(1))
    out = jax.lax.sort((side,) + tuple(kops) + tuple(payloads), num_keys=1,
                       is_stable=True)
    split = jnp.sum(le.astype(jnp.int32), dtype=jnp.int32)
    keys_out = transforms.keys_from_operands(out[1:1 + len(kops)],
                                             keys.dtype, ascending)
    kmin = transforms.keys_from_operands(min_ops, keys.dtype, ascending)[0]
    kmax = transforms.keys_from_operands(max_ops, keys.dtype, ascending)[0]
    return keys_out, tuple(out[1 + len(kops):]), split, kmin, kmax


# ---------------------------------------------------------------------------
# Device quicksort engine (sampled-splitter multiway partition)
# ---------------------------------------------------------------------------

# Max pivots per partition pass.  Splitter counts ~ the reference's pivot
# adaptivity (median-of-9 oversampling, quick_sort.hpp:285-294) scaled to
# one vectorized pass; the compare cost is C lex-ops/element on the VPU.
MAX_BUCKETS = 1024
# samples per splitter: segment sizes concentrate as ~(1 + 3/sqrt(OS));
# 32x keeps the max segment under the 2x blocked-cleanup engagement bound
# (8x measured up to 2.5x average on uniform data)
OVERSAMPLE = 32


def _splitters(kops, num_splitters: int):
    """Sorted, oversampled key-word splitters (tuple of words, each
    (num_splitters,)).  Strided sampling is deterministic and cheap; the
    oversample then quantile-read-off mirrors getMedianOf9's sample-then-
    median structure at multiway scale."""
    n = kops[0].shape[0]
    s = min(n, OVERSAMPLE * (num_splitters + 1))
    idx = ((jnp.arange(s, dtype=jnp.float32) + 0.5) * (n / s)).astype(
        jnp.int32)
    samples = tuple(jnp.take(w, idx) for w in kops)
    samples = jax.lax.sort(samples, num_keys=len(kops))
    samples = samples if isinstance(samples, (tuple, list)) else (samples,)
    spl_idx = ((jnp.arange(1, num_splitters + 1, dtype=jnp.float32))
               * (s / (num_splitters + 1))).astype(jnp.int32)
    return tuple(jnp.take(w, spl_idx) for w in samples)


def _bucket_ids(kops, spl) -> jax.Array:
    """bucket[i] = number of splitters <= key[i] (lexicographic on the key
    words) — exactly monotone in the key order, so a final sort keyed
    (bucket, key words) equals a sort keyed (key words).  One broadcast
    compare-and-reduce; XLA fuses the (n, C) intermediate into the sum."""
    if len(kops) == 2:
        hi, lo = kops
        sh, sl = spl[0][None, :], spl[1][None, :]
        le = ((sh < hi[:, None])
              | ((sh == hi[:, None]) & (sl <= lo[:, None])))
    else:
        (u,) = kops
        le = spl[0][None, :] <= u[:, None]
    return jnp.sum(le, axis=1, dtype=jnp.int32).astype(jnp.uint32)


# Cleanup block width.  Batched row sorts are the fastest reorder
# primitive on this hardware (BENCH_NOTES.md); any key interval of length
# <= BLOCK/2 is fully contained in a block of one of the two offset
# phases (offset 0 and BLOCK/2), which is what makes the blocked cleanup
# exact.  BLOCK/2 = 2x the target segment size, so sampling error must
# exceed 2x before the anti-skew fallback engages (with BLOCK == 2*thr
# the average segment already sat AT the engagement bound and the blocked
# path almost never ran — round-2 review finding).
BLOCK = 16384


def sort_arrays(keys: jax.Array, payloads=(), ascending: bool = True,
                stable: bool = False, block_threshold: int | None = None,
                key_dtype=None):
    """Device quicksort engine.  Jittable; returns
    (keys_sorted, payloads_sorted_tuple).

    Structure (the quickRecursion shape vectorized, see module docstring):

      1. sampled-splitter C-way partition: one stable sort keyed on the
         u32 bucket id groups every segment contiguously;
      2. base case: every segment is finished by BATCHED block sorts —
         phase 0 sorts aligned BLOCK-row blocks, phase 1 sorts the same
         blocks offset by BLOCK/2.  Any segment of <= BLOCK/2 rows lies
         entirely inside a block of at least one phase (an interval of
         length <= B/2 starting at x: x mod B <= B/2 puts it in a phase-0
         block, otherwise in a phase-1 block), and segments the first
         phase finished stay sorted and in place through the second, so
         the result is exact;
      3. anti-skew fallback (the quickRecursion ratio<0.2 strategy
         switch, quick_sort.hpp:316-319): when sampling error or extreme
         duplication makes any segment exceed BLOCK/2, fall back to one
         full sort keyed (bucket, key words) — always correct, just not
         blocked.
    """
    n = keys.shape[0]
    # 4096-row target segments: large enough to keep the bucket-compare
    # cost low, half the BLOCK/2 engagement bound for sampling headroom
    thr = 4096 if block_threshold is None else block_threshold
    kops = transforms.key_operands(keys, ascending, key_dtype)
    pl_ops = tuple(jnp.asarray(p) for p in payloads)
    nk = len(kops)

    # C adapted so segments land near thr rows (cmpSortThreshold role)
    c = 2
    while c < MAX_BUCKETS and c * thr < n:
        c *= 2

    # One plain sort below the threshold AND beyond the effective size
    # range: past c * BLOCK/2 rows (~8.4M at the 1024-bucket cap) even a
    # perfectly balanced partition leaves every average segment above the
    # blocked-cleanup engagement bound, so the fallback would ALWAYS run
    # and the partition pass would be pure waste.  Raising the cap
    # instead is refuted with measurements (scripts/partition_attack.py
    # @1e8: binning >= 865.8 ms + 1-key mover 724.3 ms + cleanup 269.6 ms
    # vs one full sort 753.1 ms — the mover is itself a lax.sort and does
    # not get cheaper with a small bucket domain).
    if n <= max(thr, 2) or n > c * (BLOCK // 2):
        out = jax.lax.sort(tuple(kops) + pl_ops, num_keys=nk,
                           is_stable=stable)
        return _finish(out[:nk], out[nk:], keys, key_dtype, ascending)

    spl = _splitters(kops, c - 1)
    b = _bucket_ids(kops, spl)
    pos = (jnp.arange(n, dtype=jnp.uint32),) if stable else ()
    # the partition pass only needs to GROUP buckets contiguously — the
    # cleanup phases re-sort by (bucket, key words) — so the unstable
    # 1-key sort suffices unless overall stability is requested (XLA's
    # stable sorts pay an internal index-tiebreak stream)
    moved = jax.lax.sort((b,) + tuple(kops) + pos + pl_ops, num_keys=1,
                         is_stable=stable)
    b_s = moved[0]
    streams = moved[1:]  # kops + (pos?) + payloads, bucket-grouped

    # segment sizes from the sorted bucket ids (b_s is non-decreasing)
    starts = jnp.searchsorted(b_s, jnp.arange(c, dtype=b_s.dtype),
                              side="left").astype(jnp.int32)
    ends = jnp.concatenate([starts[1:], jnp.full((1,), n, jnp.int32)])
    max_seg = jnp.max(ends - starts)

    # ---- 2./3. blocked cleanup with anti-skew fallback ------------------
    n_pad = -(-n // BLOCK) * BLOCK
    pad = n_pad - n
    # padding rows carry bucket id C — strictly greater than every real
    # bucket — and the bucket word LEADS every cleanup sort, so pads sort
    # to the tail of any block they appear in (no tie with real max-valued
    # keys is possible) and never cross a block boundary: the valid prefix
    # stays [0, n).  For real rows the bucket id is monotone in key order,
    # so (bucket, key words) sorts identically to (key words).
    b_p = jnp.pad(b_s, (0, pad), constant_values=c)
    key_sort_words = 1 + nk + (1 if stable else 0)  # b + kops (+pos)
    padded = (b_p,) + tuple(jnp.pad(s, (0, pad)) for s in streams)

    def blocked(ops):
        def phase(ops, offset):
            m = n_pad - BLOCK if offset else n_pad
            if m <= 0:
                return ops
            body = [o[offset: offset + m].reshape(m // BLOCK, BLOCK)
                    for o in ops]
            out = jax.lax.sort(tuple(body), dimension=1,
                               num_keys=key_sort_words, is_stable=False)
            return tuple(
                jnp.concatenate([o[:offset], s.reshape(m),
                                 o[offset + m:]])
                for o, s in zip(ops, out))

        return phase(phase(ops, 0), BLOCK // 2)

    def fallback(ops):
        return jax.lax.sort(tuple(ops), num_keys=key_sort_words,
                            is_stable=False)

    final = jax.lax.cond(max_seg <= BLOCK // 2, blocked, fallback, padded)
    final = tuple(s[:n] for s in final[1:])  # drop bucket word, padding
    kops_f = final[:nk]
    pl_f = final[nk + (1 if stable else 0):]
    return _finish(kops_f, pl_f, keys, key_dtype, ascending)


def _finish(kops, pl_ops, keys, key_dtype, ascending):
    keys_out = transforms.keys_from_operands(
        tuple(kops), key_dtype or keys.dtype, ascending,
        as_bits=key_dtype is not None)
    return keys_out, tuple(pl_ops)


# ---------------------------------------------------------------------------
# Host recursion driver (differential model of quick_sort.hpp semantics)
# ---------------------------------------------------------------------------

def _next_val(v: np.uint64, umax: np.uint64) -> np.uint64:
    """nextVal on the unsigned carrier (quick_sort.hpp:237-246)."""
    return v if v == umax else v + np.uint64(1)


def _get_average(a: np.uint64, b: np.uint64) -> np.uint64:
    """Overflow-safe midpoint (a&b) + ((a^b)>>1) (quick_sort.hpp:263-268)."""
    return (a & b) + ((a ^ b) >> np.uint64(1))


def _median(a, b, c):
    """median(a, b, c) (quick_sort.hpp:256-274)."""
    return max(min(a, b), min(max(a, b), c))


def _median_of_3(u: np.ndarray, left: int, right: int):
    """getMedianOf3 (quick_sort.hpp:276-283): values at left, the interval's
    own midpoint, and right."""
    mid = left + (right - left) // 2
    return _median(u[left], u[mid], u[right])


def _median_of_9(u: np.ndarray, left: int, right: int):
    """getMedianOf9 (quick_sort.hpp:285-294), index arithmetic replicated
    exactly: thirds boundaries leftMid = left + (right-left)/3 and
    rightMid = left + 2*(right-left)/3, median of the three medians-of-3
    over [left, leftMid], [leftMid+1, rightMid], [rightMid+1, right]."""
    left_mid = left + (right - left) // 3
    right_mid = left + 2 * (right - left) // 3
    return _median(_median_of_3(u, left, left_mid),
                   _median_of_3(u, left_mid + 1, right_mid),
                   _median_of_3(u, right_mid + 1, right))


def _quick_recursion(u: np.ndarray, pays: list, left0: int, right0: int,
                     choose_avg0: bool, avg0: np.uint64, umax: np.uint64,
                     threshold: int):
    """quickRecursion (quick_sort.hpp:296-332) on the unsigned carrier,
    driven by an explicit work stack (same call tree, LIFO order, immune to
    Python recursion limits on adversarial inputs)."""
    stack = [(left0, right0, choose_avg0, avg0)]
    while stack:
        left, right, choose_avg, avg = stack.pop()
        if right - left <= 0:
            continue
        if right - left < threshold:  # insertion-sort base -> stable sort
            order = np.argsort(u[left:right + 1], kind="stable")
            u[left:right + 1] = u[left:right + 1][order]
            for p in pays:
                p[left:right + 1] = p[left:right + 1][order]
            continue

        pivot = avg if choose_avg else _median_of_9(u, left, right)
        seg = u[left:right + 1]
        le = seg <= pivot
        smallest, largest = seg.min(), seg.max()
        order = np.argsort(~le, kind="stable")  # stable partition
        u[left:right + 1] = seg[order]
        for p in pays:
            p[left:right + 1] = p[left:right + 1][order]
        split = left + int(le.sum())

        # anti-skew toggle: ratio = min(split-left, right-split+1)/n < 0.2
        # flips the pivot strategy (quick_sort.hpp:313-319)
        n = right - left + 1
        ratio = min(split - left, right - split + 1) / n
        next_choose = not choose_avg if ratio < 0.2 else choose_avg

        # constant-range pruning + child interval midpoints, exactly
        # quick_sort.hpp:321-331 (Up branch; descending is handled by the
        # carrier complement).  Push right child first so the left child
        # pops first, matching the reference's call order.
        if _next_val(pivot, umax) < largest:
            stack.append((split, right, next_choose,
                          _get_average(pivot, largest)))
        if pivot > smallest:
            stack.append((left, split - 1, next_choose,
                          _get_average(pivot, smallest)))


def sort_np(keys: np.ndarray, *payloads: np.ndarray, ascending: bool = True,
            threshold: int = CMP_SORT_THRESHOLD):
    """Host quicksort with the reference's exact pivot/recursion semantics.
    Returns (keys_sorted, *payloads_sorted)."""
    u = transforms.to_sortable_np(np.asarray(keys), ascending).copy()
    pays = [np.asarray(p).copy() for p in payloads]
    n = u.shape[0]
    umax = np.uint64(np.iinfo(u.dtype).max).astype(u.dtype)
    if n > 1:
        # initial call: chooseAvg = FALSE (median-of-9 picks the first
        # pivot) with avg = midpoint of the full type range carried
        # down (quick_sort.hpp:334-361)
        _quick_recursion(u, pays, 0, n - 1, False,
                         _get_average(u.dtype.type(0), umax), umax,
                         threshold)
    keys_out = transforms.from_sortable_np(u, np.asarray(keys).dtype,
                                           ascending)
    return (keys_out, *pays)
