"""Join on keys (the north star's "hash join").

TPU-native design: sort-merge.  The build side is sorted by key with the
engine's own sort; probe rows find their match range with a vectorized
binary search (two searchsorted calls on the transformed keys), and matched
build payloads are fetched with gathers.  No hash table, no scatter, static
shapes throughout — on TPU a sorted-array "hash table" probed by binary
search is the idiomatic equivalent of a bucketed hash table.

Two shapes of result:

  * lookup_join: one output row per probe row (first match + match count),
    static shape == probe shape.  Covers the common unique-build-key case
    exactly (then match_count is 0/1).
  * inner_join_expand: full inner-join expansion with duplicate build keys,
    into a caller-provided static capacity (padded + total count), using
    rank arithmetic over match offsets — still scatter-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import transforms
from . import xla_sort


def _searchsorted_side(sorted_u, query_u, side):
    return jnp.searchsorted(sorted_u, query_u, side=side)


def build_index(build_keys: jax.Array, build_payloads=()):
    """Sort the build side by key; returns (sorted_transformed_keys,
    sorted_keys, sorted_payloads) — the "hash table"."""
    keys_s, pays_s = xla_sort.sort_arrays(build_keys, tuple(build_payloads),
                                          ascending=True)
    u = transforms.to_sortable(keys_s, True)
    return u, keys_s, pays_s


def lookup_join(probe_keys: jax.Array, build_keys: jax.Array,
                build_payloads=(), probe_is_transformed: bool = False):
    """For each probe row: (found, match_count, first-match build payloads).

    Returns (found_mask, match_counts, gathered_build_payloads).  With
    duplicate build keys the FIRST (lowest sorted position) match is
    returned; match_counts reports how many build rows matched.
    """
    u_build, _, pays_s = build_index(build_keys, build_payloads)
    u_probe = (probe_keys if probe_is_transformed
               else transforms.to_sortable(probe_keys, True))
    lo = _searchsorted_side(u_build, u_probe, "left")
    hi = _searchsorted_side(u_build, u_probe, "right")
    counts = (hi - lo).astype(jnp.int32)
    found = counts > 0
    safe = jnp.clip(lo, 0, max(build_keys.shape[0] - 1, 0))
    gathered = tuple(jnp.take(p, safe, axis=0) for p in pays_s)
    return found, counts, gathered


def inner_join_expand(probe_keys: jax.Array, probe_payloads,
                      build_keys: jax.Array, build_payloads,
                      capacity: int):
    """Full inner join with duplicate build keys, expanded into `capacity`
    output rows (static).  Returns (total_matches, out_probe_idx,
    out_probe_keys, out_probe_payloads, out_build_payloads); rows past
    total_matches are padding.  If total_matches > capacity the result is
    truncated (caller checks and re-runs with a larger capacity — the
    static-shape idiom for data-dependent output sizes).

    Expansion is scatter-free: output slot t finds its probe row by binary
    search over the cumulative match counts, then its build row by rank
    arithmetic within that probe row's match range.
    """
    u_build, build_keys_s, build_pays_s = build_index(build_keys,
                                                      build_payloads)
    u_probe = transforms.to_sortable(probe_keys, True)
    lo = _searchsorted_side(u_build, u_probe, "left")
    hi = _searchsorted_side(u_build, u_probe, "right")
    counts = (hi - lo).astype(jnp.int32)
    cum = jnp.cumsum(counts, dtype=jnp.int32)      # inclusive
    total = cum[-1] if counts.shape[0] else jnp.int32(0)

    t = jnp.arange(capacity, dtype=jnp.int32)
    # probe row of output slot t: first row whose inclusive cumsum exceeds t
    probe_idx = jnp.searchsorted(cum, t, side="right").astype(jnp.int32)
    probe_idx_safe = jnp.clip(probe_idx, 0, max(probe_keys.shape[0] - 1, 0))
    start_of_row = jnp.take(cum, probe_idx_safe) - jnp.take(counts,
                                                            probe_idx_safe)
    build_pos = jnp.take(lo, probe_idx_safe) + (t - start_of_row)
    build_pos = jnp.clip(build_pos, 0, max(build_keys.shape[0] - 1, 0))

    out_probe_keys = jnp.take(probe_keys, probe_idx_safe, axis=0)
    out_probe_pays = tuple(jnp.take(p, probe_idx_safe, axis=0)
                           for p in probe_payloads)
    out_build_pays = tuple(jnp.take(p, build_pos, axis=0)
                           for p in build_pays_s)
    return total, probe_idx_safe, out_probe_keys, out_probe_pays, out_build_pays


# Saturation bound for the x64-off cumsum in merge_join_indices: headroom
# so the saturating add a+b <= 2*_SAT32 never wraps int32.
_SAT32 = (1 << 30) - 1


def _saturating_cumsum(count: jax.Array) -> jax.Array:
    """Inclusive prefix sum of non-negative int32 counts that saturates at
    _SAT32 instead of wrapping.  min(a+b, S) is associative on [0, S], so a
    log-depth associative scan computes it exactly: prefixes whose true sum
    is < _SAT32 are exact, larger ones read _SAT32."""
    c = jnp.minimum(count.astype(jnp.int32), _SAT32)
    return jax.lax.associative_scan(
        lambda a, b: jnp.minimum(a + b, _SAT32), c)


def merge_join_indices(probe_ops, n_probe_valid, build_ops, n_build_valid,
                       capacity: int):
    """Inner-join row matching over PADDED transformed-key operand tuples
    (lexicographic multi-word keys — works for 64-bit (hi, lo) carriers
    where a single-word binary search cannot).

    probe_ops / build_ops are tuples of same-length uint words; rows at
    index >= n_*_valid are buffer padding (contents ignored).  Either
    n_*_valid may instead be a BOOLEAN MASK of valid rows (any positions,
    not just a prefix) — the distributed join's heavy-hitter path joins a
    replicated build table whose valid rows are per-source chunks.  Returns
    (total, probe_idx, build_idx): output slot t joins probe row
    probe_idx[t] with build row build_idx[t]; slots past `total` carry
    clipped padding indices.  total may exceed `capacity` (truncated
    output) — callers treat that as overflow and retry bigger.

    Scatter-free sort-merge: one variadic stable sort of both tables'
    rows keyed (invalid, key words, side) groups each key's build rows
    immediately before its probe rows; per-run build counts come from one
    cumulative sum, and output slots map back to (probe, build) pairs with
    the same rank arithmetic as inner_join_expand (this file) — the
    distributed join's local step (SURVEY.md section 7 step 5 scaled out).
    """
    # the saturating-scan bound only binds the x64-off branch below; with
    # x64 on, the int64 cumsum is exact for any int32 capacity
    if capacity >= _SAT32 and not jax.config.read("jax_enable_x64"):
        raise ValueError(f"capacity {capacity} must be < {_SAT32} with "
                         "jax_enable_x64 off (saturating-cumsum "
                         "exactness bound)")
    n_p = probe_ops[0].shape[0]
    n_b = build_ops[0].shape[0]
    m = n_b + n_p
    if m == 0:  # both buffers empty: no pairs (the run machinery below
        #         cannot trace on 0 rows)
        zero_idx = jnp.zeros(capacity, jnp.int32)
        return jnp.int32(0), zero_idx, zero_idx
    iota_p = jnp.arange(n_p, dtype=jnp.int32)
    iota_b = jnp.arange(n_b, dtype=jnp.int32)

    def _invalid(iota, v):
        if getattr(v, "ndim", 0) == 1:  # boolean validity mask
            if v.dtype != jnp.bool_:
                # ~ on an int 0/1 mask is -1/-2 — every row would be
                # silently flagged invalid and the join would return 0
                raise TypeError(
                    f"validity mask must be boolean, got {v.dtype}")
            return ~v
        return iota >= v

    inval = jnp.concatenate([_invalid(iota_b, n_build_valid),
                             _invalid(iota_p, n_probe_valid)]
                            ).astype(jnp.uint8)
    side = jnp.concatenate([jnp.zeros(n_b, jnp.uint8),
                            jnp.ones(n_p, jnp.uint8)])
    words = tuple(jnp.concatenate([bw, pw])
                  for bw, pw in zip(build_ops, probe_ops))
    idx = jnp.concatenate([iota_b, iota_p])

    nw = len(words)
    out = jax.lax.sort((inval,) + words + (side, idx),
                       num_keys=2 + nw, is_stable=True)
    s_inval, s_words, s_side, s_idx = (out[0], out[1:1 + nw],
                                       out[1 + nw], out[2 + nw])

    is_build = ((s_side == 0) & (s_inval == 0)).astype(jnp.int32)
    is_probe = (s_side == 1) & (s_inval == 0)
    # key-run starts (invalid rows form their own runs at the tail)
    neq = jnp.zeros(m, jnp.bool_).at[0].set(True)
    for w in (s_inval,) + s_words:
        neq = neq | (w != jnp.roll(w, 1)).at[0].set(True)
    pos = jnp.arange(m, dtype=jnp.int32)
    run_start = jax.lax.cummax(jnp.where(neq, pos, 0))
    cb = jnp.cumsum(is_build, dtype=jnp.int32)  # inclusive build count
    cb_before_run = (jnp.take(cb, run_start)
                     - jnp.take(is_build, run_start))
    # builds sort before probes within a run, so every build of the run
    # precedes any probe row i of the run: matches(i) = cb[i] - before
    count = jnp.where(is_probe, cb - cb_before_run, 0)

    # int64 accumulation: a hot co-located key pair can produce > 2^31
    # output pairs, and a wrapped int32 cumsum is non-monotonic — binary
    # search then misroutes even in-capacity slots and the overflow flag
    # silently reads False.  Only the prefix below `capacity` must be
    # exact in 32 bits, so the search runs on the capped cumsum.  With
    # x64 off, jnp.cumsum(dtype=int64) would silently compute in int32;
    # there the scan saturates at _SAT32 instead of wrapping: every
    # unsaturated prefix is exact, and a saturated one forces
    # total > capacity, so overflow can never silently read False
    # (capacity < _SAT32 is enforced above).
    if jax.config.read("jax_enable_x64"):
        cum = jnp.cumsum(count.astype(jnp.int64), dtype=jnp.int64)
    else:
        cum = _saturating_cumsum(count)
    total = cum[-1] if m else cum.dtype.type(0)
    cum_cap = jnp.minimum(cum, capacity).astype(jnp.int32)
    t = jnp.arange(capacity, dtype=jnp.int32)
    mpos = jnp.clip(jnp.searchsorted(cum_cap, t,
                                     side="right").astype(jnp.int32),
                    0, max(m - 1, 0))
    # slot start from the owning row's cumsum: the true start is < t <
    # capacity, so it is exact in int32 whenever that cumsum is exact
    # (always under x64; under the saturating scan a clipped start can
    # only occur on runs that already force the overflow flag)
    start = (jnp.take(cum, mpos)
             - jnp.take(count, mpos).astype(cum.dtype))
    offset = t - jnp.clip(start, 0, capacity).astype(jnp.int32)
    bpos = jnp.clip(jnp.take(run_start, mpos) + offset, 0, max(m - 1, 0))
    return total, jnp.take(s_idx, mpos), jnp.take(s_idx, bpos)


def semi_join(probe_keys, probe_payloads, build_keys, anti: bool = False):
    """Rows of the probe table whose key does (semi) or does not (anti)
    appear in the build table — lookup + stable compaction.

    Returns (count, probe_keys_packed, probe_payloads_packed...)."""
    from . import filter as filter_op
    found, _, _ = lookup_join(probe_keys, build_keys)
    mask = ~found if anti else found
    return filter_op.compact(mask, probe_keys, *probe_payloads)
