"""North-star config 4: filter -> radix sort -> hash aggregate at 1e9 rows.

BASELINE.json config 4: "Filter -> radix sort -> hash aggregate (group-by
on sorted key prefix) on 1B rows, single host, exchange/compute overlap
on-chip".  The reference has no operator pipeline (its scope ends at the
sort, SURVEY.md §2); this drives OUR operator set end to end at a scale
that cannot fit a monolithic working set in 16 GB HBM.

TPU-native shape:
  * 1e9 rows stream through the chip in CHUNKS static-shape chunks.  Each
    chunk is one jitted program dispatched back-to-back with the next --
    the async XLA dispatch queue is the single-chip analogue of
    exchange/compute overlap (chunk i+1's generation/filter overlaps the
    host-side bookkeeping of chunk i; nothing round-trips to the host
    until the final fence).
  * Rows are generated ON DEVICE (splitmix64 of a global row index), so
    the 12 GB input never crosses the host tunnel.
  * The filter fuses into the sort key: rejected rows get the sentinel
    key G and sort to the tail where the aggregate drops them -- the
    mask+compaction and the partition permutation are one fused XLA sort,
    exactly the design argument in ops/filter.py (the reference's
    mask_compressstoreu and its radix partition are likewise one
    primitive family, simd.hpp:310-389).  --mode staged runs the
    filter as a separate compact() pass instead (two sorts) for an
    honest ablation of that fusion.
  * Per chunk: sort (u32 group key + u64 value) -> sorted-prefix group
    aggregate (ops/hashagg.group_aggregate, presorted=True) -> compacted
    partial table of at most G+1 groups.  Partials stay on device; the
    merge is one more group_aggregate over the 10*(G+1)-row concat --
    sort-based, scatter-free (TPU scatter is the measured dead end,
    DESIGN_NOTES.md).

Validation: --validate runs the identical pipeline at small n and checks
sums/counts per group against a NumPy groupby model.

Usage:
  python scripts/pipeline_1e9.py                      # 1e9 rows on TPU
  python scripts/pipeline_1e9.py --n 1e6 --validate   # small, any backend
"""

import argparse
import json
import time

import benchlib  # jax config: x64 + compile cache + SRS_PLATFORM
import jax
import jax.numpy as jnp
import numpy as np

from benchlib import M3, splitmix64
from simd_radix_sort_tpu.ops import filter as filter_ops
from simd_radix_sort_tpu.ops import hashagg
from simd_radix_sort_tpu.ops.xla_sort import sort_arrays


def make_chunk_fn(n_chunk: int, groups: int, mode: str):
    """One jitted pipeline stage over n_chunk rows starting at row `base`.

    Returns padded per-chunk partials: (group_keys[cap], sums[cap],
    counts[cap]) with rows past the chunk's group count carrying the
    sentinel key `groups` (dropped at merge time).
    """
    # a chunk can produce at most min(n_chunk, groups + 1) distinct keys
    # (+1 for the sentinel group of filtered-out rows)
    cap = min(groups + 1, n_chunk)

    def chunk(base):
        i = base + jnp.arange(n_chunk, dtype=jnp.uint64)
        k = (splitmix64(i) % np.uint64(groups)).astype(jnp.uint32)
        v = splitmix64(i ^ M3)  # independent u64 value stream
        keep = (v & np.uint64(3)) != 0  # 75% selectivity predicate
        if mode == "fused":
            # filter fused into the sort: rejects take the sentinel key
            kk = jnp.where(keep, k, np.uint32(groups))
            ks, (vs,) = sort_arrays(kk, (v,), ascending=True)
        else:  # staged: explicit mask+compaction, then sort the prefix
            # compact fills the tail of BOTH streams with `groups`; the
            # tail's values therefore land in the sentinel group, whose
            # aggregate is discarded wholesale at merge time
            cnt, fk, fv = filter_ops.compact(keep, k, v,
                                             fill=np.uint32(groups))
            ks, (vs,) = sort_arrays(fk, (fv,), ascending=True)
        ng, gk, ((sums,), cnt_g) = hashagg.group_aggregate(
            ks, vs, aggs=("sum", "count"), presorted=True)
        sel = jnp.arange(cap, dtype=jnp.int32) < ng
        gk_c = jnp.where(sel, gk[:cap], np.uint32(groups))
        return gk_c, sums[:cap], cnt_g[:cap].astype(jnp.int64)

    return jax.jit(chunk)


def make_merge_fn():
    """Merge per-chunk partials: one more sorted-prefix aggregate."""
    def merge(gks, sums, cnts):
        gk = jnp.concatenate(gks)
        ng, mk, ((msum, mcnt),) = hashagg.group_aggregate(
            gk, (jnp.concatenate(sums), jnp.concatenate(cnts)),
            aggs=("sum",), agg_streams=[(0, 1)])
        return ng, mk, msum, mcnt
    return jax.jit(merge)


def build(n: int, chunks: int, groups: int, mode: str):
    """Trace/compile the chunk + merge programs once (untimed warmup)."""
    n_chunk = n // chunks
    assert n_chunk * chunks == n, "n must divide by chunks"
    chunk_fn = make_chunk_fn(n_chunk, groups, mode)
    merge_fn = make_merge_fn()
    bases = [jnp.uint64(c * n_chunk) for c in range(chunks)]
    warm = chunk_fn(bases[0])
    wm = merge_fn([warm[0]] * chunks, [warm[1]] * chunks, [warm[2]] * chunks)
    benchlib.fence(wm)
    return chunk_fn, merge_fn, bases


def run_pipeline(n: int, chunks: int, groups: int, mode: str,
                 programs=None):
    chunk_fn, merge_fn, bases = programs or build(n, chunks, groups, mode)

    t0 = time.perf_counter()
    parts = [chunk_fn(b) for b in bases]  # back-to-back async dispatch
    ng, mk, msum, mcnt = merge_fn([p[0] for p in parts],
                                  [p[1] for p in parts],
                                  [p[2] for p in parts])
    benchlib.fence((ng, mk))
    dt = time.perf_counter() - t0

    ng = int(ng)
    mk = np.asarray(mk[:ng])
    msum = np.asarray(msum[:ng])
    mcnt = np.asarray(mcnt[:ng])
    # drop the sentinel group (rejected rows), if any survived to here
    real = mk < groups
    return dt, mk[real], msum[real], mcnt[real]


def validate(n: int, chunks: int, groups: int, mode: str):
    _, mk, msum, mcnt = run_pipeline(n, chunks, groups, mode)
    i = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        k = (np.asarray(splitmix64(i)) % groups).astype(np.uint32)
        v = np.asarray(splitmix64(i ^ M3))
    keep = (v & np.uint64(3)) != 0
    k, v = k[keep], v[keep]
    order = np.argsort(k, kind="stable")
    uk, starts = np.unique(k[order], return_index=True)
    gsum = np.add.reduceat(v[order], starts)
    gcnt = np.diff(np.append(starts, k.size))
    assert np.array_equal(mk, uk), "group keys mismatch"
    assert np.array_equal(msum, gsum), "group sums mismatch"
    assert np.array_equal(mcnt, gcnt), "group counts mismatch"
    print(f"validate ok: n={n} chunks={chunks} groups={groups} mode={mode} "
          f"({uk.size} groups)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=float, default=1e9)
    ap.add_argument("--chunks", type=int, default=10)
    ap.add_argument("--groups", type=int, default=1 << 20)
    ap.add_argument("--mode", choices=("fused", "staged"), default="fused")
    ap.add_argument("--validate", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    n = int(args.n)

    if args.validate:
        validate(n, args.chunks, args.groups, args.mode)
        return

    programs = build(n, args.chunks, args.groups, args.mode)
    best = None
    for _ in range(args.reps):
        dt, mk, _, mcnt = run_pipeline(n, args.chunks, args.groups,
                                       args.mode, programs=programs)
        best = dt if best is None else min(best, dt)
    print(json.dumps({
        "metric": "filter+sort+aggregate pipeline rows/s/chip",
        "value": round(n / best),
        "unit": "rows/s",
        "n": n, "chunks": args.chunks, "groups": args.groups,
        "mode": args.mode, "seconds": round(best, 3),
        "groups_out": int(mk.size), "rows_kept": int(mcnt.sum()),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
