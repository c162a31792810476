"""Group-by aggregate (the north star's "hash aggregate").

On TPU the idiomatic grouping engine is sort-based: sort rows by key (the
engine's own radix/xla sort), mark group boundaries, and reduce segments with
scan algebra — no scatter, no data-dependent shapes:

  * sum / count: inclusive cumsum diffed at group ends (integers — exact);
                 float sums use the segmented scan instead, keeping
                 rounding error group-local (a global running total
                 cancels catastrophically against small group sums);
  * min / max:   segmented inclusive scan (associative_scan over (flag, value)
                 pairs with a boundary-reset combiner) read at group ends;

then one stable compaction (ops/filter.py) packs the per-group results.

Returns padded, static-shape results + num_groups, the XLA idiom.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..utils import transforms
from . import filter as filter_ops
from . import xla_sort

AGGS = ("sum", "count", "min", "max", "mean")


def _segmented_scan(vals: jax.Array, starts: jax.Array, op):
    """Inclusive segmented scan: reduce with `op` within segments that begin
    where `starts` is True."""
    def combine(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, op(va, vb))
    _, out = jax.lax.associative_scan(combine, (starts, vals))
    return out


def group_aggregate(keys: jax.Array, values, aggs=("sum",),
                    presorted: bool = False, method: str = "xla",
                    agg_streams=None, max_groups: int | None = None):
    """Aggregate `values` (one array or a tuple of arrays) per distinct key.

    Returns (num_groups, group_keys, results) where results[agg_index] is a
    tuple with one array per value stream (except "count": one array).  All
    outputs are padded to n rows; rows past num_groups are meaningless.

    `agg_streams` (optional, parallel to `aggs`) restricts each aggregate
    to a subset of value-stream indices — e.g. combine data streams with
    "sum" while a validity stream gets only "max" — so no scan runs on a
    stream whose result is unused.  results[agg_index] then has one entry
    per SELECTED stream, in selection order.

    `max_groups` (optional): a caller-known bound on the number of distinct
    keys.  When set, the compaction that packs per-group results switches
    from a global n-row stable sort to the blocked bounded form
    (ops/filter.compact_bounded) — the dominant cost of this op at large n
    — and outputs are padded to max_groups rows instead of n.  The bound is
    a promise: if it is wrong, num_groups returned is still the TRUE group
    count (callers can check num_groups <= max_groups), the first
    max_groups groups are exact, and the rest are absent.
    """
    single = not isinstance(values, (tuple, list))
    vals = (values,) if single else tuple(values)
    for a in aggs:
        if a not in AGGS:
            raise ValueError(f"unknown aggregate {a!r}; have {AGGS}")
    if agg_streams is None:
        agg_streams = [tuple(range(len(vals)))] * len(aggs)
    n = keys.shape[0]

    if not presorted:
        keys, vals = xla_sort.sort_arrays(keys, vals, ascending=True)

    u = transforms.to_sortable(keys, True)
    if u.dtype == jnp.uint64:
        hi, lo = transforms.split64(u)
        neq = (jnp.roll(hi, 1) != hi) | (jnp.roll(lo, 1) != lo)
    else:
        neq = jnp.roll(u, 1) != u
    starts = neq.at[0].set(True) if n else neq
    ends = jnp.roll(starts, -1) if n else starts  # last row of each group

    pos = jnp.arange(n, dtype=jnp.int64 if n > 2**31 - 1 else jnp.int32)

    # Every aggregate reads its per-row scan at the SAME group-end rows, so
    # all of them (plus the group keys) share ONE stable compaction sort
    # instead of one sort per stream — the compaction is the dominant cost
    # at large n (each _compact_at was a full n-row lax.sort).
    pending = [keys]  # stream 0: the group keys

    def register(arr):
        pending.append(arr)
        return len(pending) - 1

    # pos+1 keeps pos's dtype (int64 past 2^31 rows) so a single giant
    # group's count cannot wrap
    need_cnt = any(a in ("count", "mean") for a in aggs)
    cnt_slot = register(pos + 1) if need_cnt else None

    plans = []  # (agg, [(slot, scan_dtype)...]) per requested aggregate
    scan_memo = {}  # (scan kind, stream index) -> (slot, scan_dtype):
    # sum and mean share one scan per stream, and repeated aggs reuse
    # theirs — duplicate scans would ride the single compaction sort as
    # dead extra operands (its dominant cost is stream bandwidth)
    for agg, streams in zip(aggs, agg_streams):
        if agg == "count":
            plans.append((agg, [(cnt_slot, None)]))
            continue
        slots = []
        for i in streams:
            v = vals[i]
            kind = "sum" if agg in ("sum", "mean") else agg
            if (kind, i) in scan_memo:
                slots.append(scan_memo[kind, i])
                continue
            if kind == "sum":
                acc = v.astype(jnp.float32) if v.dtype == jnp.float16 else v
                if np.dtype(acc.dtype).kind == "f":
                    # float sums use a SEGMENTED scan: a global cumsum
                    # diffed at group ends cancels catastrophically once
                    # the running total dwarfs a group's sum (caught by
                    # fuzzing); the segmented form keeps rounding error
                    # group-local.  Integer cumsum is exact, so it keeps
                    # the cheaper global form.
                    entry = (register(_segmented_scan(acc, starts, jnp.add)),
                             None)
                else:
                    entry = (register(jnp.cumsum(acc)), acc.dtype)
            else:  # min / max
                op = jnp.minimum if kind == "min" else jnp.maximum
                entry = (register(_segmented_scan(v, starts, op)), None)
            scan_memo[kind, i] = entry
            slots.append(entry)
        plans.append((agg, slots))

    if max_groups is not None:
        packed = filter_ops.compact_bounded(ends, *pending,
                                            max_out=max_groups)
    else:
        packed = filter_ops.compact(ends, *pending)
    num_groups, group_keys = packed[0], packed[1]
    at_ends = packed[1:]

    results = []
    for agg, slots in plans:
        if agg == "count":
            results.append(_diff_groups(at_ends[cnt_slot]))
        elif agg in ("sum", "mean"):
            # dt=None marks a segmented (float) scan whose end value IS
            # the group sum; otherwise diff the global integer cumsum
            per_stream = [at_ends[s] if dt is None else
                          _diff_groups(at_ends[s]).astype(dt)
                          for s, dt in slots]
            if agg == "mean":
                cnt = _diff_groups(at_ends[cnt_slot])
                per_stream = [s / cnt.astype(s.dtype) if
                              np.dtype(s.dtype).kind == "f" else
                              (s // cnt.astype(s.dtype))
                              for s in per_stream]
            results.append(tuple(per_stream))
        else:  # min / max: the segmented-scan value at the end IS the result
            results.append(tuple(at_ends[s] for s, _ in slots))

    return num_groups, group_keys, tuple(results)


def _diff_groups(acc_at_ends: jax.Array) -> jax.Array:
    """Per-group totals from compacted inclusive-cumsum values at group ends."""
    prev = jnp.roll(acc_at_ends, 1)
    prev = prev.at[0].set(0) if acc_at_ends.shape[0] else prev
    return acc_at_ends - prev
