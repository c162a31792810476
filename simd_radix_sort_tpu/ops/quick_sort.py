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

  * `sort(...)` — quickRecursion semantics (quick_sort.hpp:296-332):
    median-of-9 pivots (quick_sort.hpp:285-294), overflow-safe interval
    midpoints (`get_average`, quick_sort.hpp:263-268), the 80/20 anti-skew
    strategy toggle (ratio < 0.2 -> switch pivot rule, quick_sort.hpp:
    316-319), and constant-range pruning (skip recursion when
    pivot > smallest / next_val(pivot) < largest, quick_sort.hpp:321-330).
    Recursion over data-dependent segment boundaries cannot live under one
    static-shape jit, so the recursion driver runs on the host over carrier
    arrays (like the reference's call tree runs on the CPU), delegating
    each partition to vectorized NumPy.  It serves as the differential
    model for the pivot logic and as the `quick` registry method; the
    jit-compatible production engines are xla/radix/count.
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
