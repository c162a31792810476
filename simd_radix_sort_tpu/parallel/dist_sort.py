"""Multi-chip distributed sort over a jax.sharding.Mesh.

New scope relative to the reference (which is strictly single-threaded —
SURVEY.md section 2.11): the TPU-native scale-out path from BASELINE.json's
north star.  Design (histogram-sort-with-sampling family, PAPERS.md):

  1. each device locally sorts its row shard (the engine's own sort);
  2. evenly-spaced key samples are all_gathered and sorted; P-1 splitters
     are read off at the sample quantiles;
  3. every device slices its sorted shard into P key-range buckets
     (vectorized searchsorted) and exchanges bucket p to device p with
     all_to_all over the mesh axis (ICI);
  4. each device merges what it received with one more local sort; invalid
     (padding) rows carry a sentinel flag used as the primary sort key so
     they collect at the tail.

The exchange is `jax.lax.ragged_all_to_all`: buckets are contiguous runs of
the locally sorted shard, so the shard itself is the send operand and only
offset/size vectors are computed (via one all_gather of the (src, dst)
length matrix).  Receive buffers have a static capacity (the XLA
static-shape idiom); an overflow flag reports when sampling error or key
skew exceeded it so the caller can rerun with a larger factor.  XLA:CPU has
no ragged-all-to-all thunk, so a dense all_gather emulation backs the
virtual-mesh test path.  Keys are tie-broken exactly with a
device-interleaved position carried as an extra u32 word of the
lexicographic sample/search domain — which keeps duplicate-heavy
distributions (Zero, ZeroOne) and pre-sorted inputs perfectly balanced
without any 64-bit lane dependence.

Output stays sharded: (keys, payloads) padded per device + per-device valid
counts — concatenating each device's valid prefix in mesh order is the
globally sorted table (gather_result does this on the host).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils import common, transforms


DEFAULT_AXIS = "x"


def make_mesh(num_devices: int | None = None, axis: str = DEFAULT_AXIS) -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def default_use_ragged(use_ragged: bool | None) -> bool:
    if use_ragged is None:
        # XLA:CPU has no ragged-all-to-all thunk; TPU/GPU do.
        return jax.default_backend() != "cpu"
    return use_ragged


_TRACE_CACHE: dict = {}
_TRACE_CACHE_MAX = 64


def cached_jit(key, make):
    """Memo of jitted entry programs.  jax.jit caches traces per function
    OBJECT, and the host entries used to build a fresh shard_map + jit
    closure on every call (and every elastic retry), so identical-shape
    calls paid full retrace — seconds per call for these graphs on a
    1-core host (round-3 review).  `key` must cover every static that
    shapes the traced program (mesh, axis, capacities, dtypes, shapes,
    flags); `make` builds the callable to jit on miss."""
    fn = _TRACE_CACHE.get(key)
    if fn is None:
        if len(_TRACE_CACHE) >= _TRACE_CACHE_MAX:
            _TRACE_CACHE.pop(next(iter(_TRACE_CACHE)))
        fn = _TRACE_CACHE[key] = jax.jit(make())
    return fn


def exchange_by_bounds(streams, bounds, axis: str, cap_recv: int,
                       use_ragged: bool, n_valid=None):
    """Bucketed all-to-all of locally-contiguous buckets (the shared
    exchange core of the distributed sort, join, and hierarchical sort).

    `streams` are per-device arrays of n_local rows whose bucket-p rows
    form the contiguous run [bounds[p-1], bounds[p]) (bounds has P-1
    entries; run 0 starts at 0, run P-1 ends at n_local).  Bucket p of
    every device is delivered to device p, packed source-major into a
    cap_recv-row buffer per stream.

    Returns (recv_streams, total_recv, overflow): rows past total_recv are
    buffer padding; overflow is the pmax'd flag that some device's buckets
    exceeded cap_recv (its results are then truncated).

    On TPU the transfer is one `jax.lax.ragged_all_to_all` per stream with
    the locally sorted shard itself as the send operand — zero send-side
    copies (SURVEY.md section 2.11 "TPU-native plan"); backends without a
    ragged thunk (XLA:CPU) use a dense all_gather emulation with the same
    math.  Must be called inside shard_map over `axis`.
    """
    n_local = streams[0].shape[0]
    if n_local == 0:
        # static-shape SPMD: every device sees the same (empty) shard, so
        # skipping the collective uniformly is consistent; gathers from a
        # 0-row operand do not lower (round-3 review)
        return ([jnp.zeros((cap_recv,), s.dtype) for s in streams],
                jnp.int32(0), jnp.zeros((), jnp.int32))
    # rows past n_valid (buffer padding from an earlier exchange) are
    # never shipped: bounds clip to it and the last bucket ends there
    end_last = (jnp.int32(n_local) if n_valid is None
                else jnp.minimum(jnp.int32(n_valid), n_local))
    bounds = jnp.minimum(bounds, end_last)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), bounds])
    ends = jnp.concatenate([bounds, end_last[None]])
    return exchange_by_runs(streams, starts, ends - starts, axis, cap_recv,
                            use_ragged)


def exchange_by_runs(streams, starts, lens, axis: str, cap_recv: int,
                     use_ragged: bool):
    """Generalized bucketed all-to-all: the run
    [starts[p], starts[p] + lens[p]) of every device's streams is delivered
    to device p, packed source-major into a cap_recv-row buffer per stream.
    Unlike `exchange_by_bounds`, the per-destination runs need not be
    adjacent — the blocked final mode exchanges one key segment at a time,
    whose runs have gaps (the other segments) between them.  Runs must be
    disjoint and in destination order.  Must be called inside shard_map."""
    my = jax.lax.axis_index(axis)
    num_p = jax.lax.axis_size(axis)
    n_local = streams[0].shape[0]
    if n_local == 0:
        return ([jnp.zeros((cap_recv,), s.dtype) for s in streams],
                jnp.int32(0), jnp.zeros((), jnp.int32))

    L = jax.lax.all_gather(lens, axis)          # L[src, dst]
    total_raw = jnp.sum(L[:, my])
    overflow = total_raw > cap_recv
    total_recv = jnp.minimum(total_raw, cap_recv)
    # never write out of a destination buffer even when overflowing
    # (results are then incomplete and the overflow flag is set).  The
    # clip is applied to the WHOLE replicated size matrix so that the
    # sender's send_sizes and the receiver's recv_sizes are the same
    # numbers — ragged_all_to_all requires consistent metadata on both
    # ends, and clipping only the send side would leave the overflowing
    # receiver waiting on rows nobody sends (round-3 review).
    csum_dst = jnp.cumsum(L, axis=0) - L        # exclusive over src
    allowed = jnp.clip(cap_recv - csum_dst, 0, None)
    Lc = jnp.minimum(L, allowed)                # clipped sizes, replicated
    lens = Lc[my, :]                            # what I send
    recv_sizes = Lc[:, my]                      # what I receive
    output_offsets = jnp.clip(csum_dst[my, :], 0, max(cap_recv - 1, 0))

    if use_ragged:
        def exchange(stream):
            out_buf = jnp.zeros((cap_recv,), stream.dtype)
            return jax.lax.ragged_all_to_all(
                stream, out_buf, starts, lens, output_offsets, recv_sizes,
                axis_name=axis)
    else:
        # Dense emulation for backends without ragged-all-to-all
        # (XLA:CPU): all_gather everything, assemble my ragged slice
        # locally.  Same math, O(P) extra traffic — test/debug path only.
        starts_all = jax.lax.all_gather(starts, axis)   # (P, P)[src, dst]
        col_excl = csum_dst[:, my]                      # (P,) by src
        col_incl = col_excl + recv_sizes
        t = jnp.arange(cap_recv, dtype=jnp.int32)
        q_t = jnp.searchsorted(col_incl, t, side="right").astype(jnp.int32)
        q_safe = jnp.clip(q_t, 0, num_p - 1)
        off = t - jnp.take(col_excl, q_safe)
        src_idx = jnp.clip(jnp.take(starts_all[:, my], q_safe) + off,
                           0, n_local - 1)

        def exchange(stream):
            all_ops = jax.lax.all_gather(stream, axis)  # (P, n_local)
            return all_ops[q_safe, src_idx]

    recv = [exchange(s) for s in streams]
    overflow = jax.lax.pmax(overflow.astype(jnp.int32), axis)
    return recv, total_recv, overflow


def lex_bounds(domain, splitters):
    """Bucket boundaries of P-1 splitters in a locally sorted multi-word
    lexicographic domain: bounds[p] = number of local rows strictly below
    splitter p (each bucket p is then [bounds[p-1], bounds[p])).

    Cost: the multi-word path is a broadcast compare-and-count, O(n_local
    * (P-1) * words) VPU ops with the (n, P-1) intermediate fused into
    the reduce — at a 256-chip pod with 10M-row shards that is ~5e9 lane
    ops, well under 2 ms on a v5e VPU and dwarfed by the exchange it
    feeds.  A two-level searchsorted would be O(n log P) but needs
    per-splitter tie-range refinement that does not vectorize with
    jnp.searchsorted; revisit only if profiles show this pass."""
    if len(domain) == 1:
        return jnp.searchsorted(domain[0], splitters[0],
                                side="left").astype(jnp.int32)
    cols = tuple(w[:, None] for w in domain)
    rows = tuple(w[None, :] for w in splitters)
    less = jnp.zeros((domain[0].shape[0], splitters[0].shape[0]), jnp.bool_)
    eq = jnp.ones_like(less)
    for c, r in zip(cols, rows):
        less = less | (eq & (c < r))
        eq = eq & (c == r)
    return jnp.sum(less, axis=0, dtype=jnp.int32)


def gather_splitters(domain, axis: str, num_splitters: int,
                     samples_per_shard: int, n_valid=None):
    """Evenly sample the local sorted domain, all_gather and sort the
    samples, read splitters off the quantiles.  Returns a tuple of words,
    each (num_splitters,).

    `n_valid` (traced scalar) restricts sampling to the valid prefix of a
    padded buffer — without it, buffer padding dilutes the sample and the
    quantile splitters collapse toward the padding sentinel (measured:
    87% padding sent every row to device 0)."""
    return gather_splitters_parts([(domain, n_valid)], axis,
                                  num_splitters, samples_per_shard)


def sample_strided(domain, axis: str, s: int, n_valid=None):
    """`s` evenly strided rows from each shard's (valid prefix of the)
    multi-word domain, all_gathered along `axis`.  The one sampling
    primitive behind splitter selection AND heavy-hitter detection — a
    precision or striding fix lands in both.  Returns a list of (s*P,)
    words.

    An empty shard (or one whose valid prefix is empty) contributes `s`
    zero rows; callers that must not let those perturb quantiles carry a
    validity channel alongside (gather_splitters_parts does)."""
    n_local = domain[0].shape[0]
    if n_local == 0:
        return [jax.lax.all_gather(jnp.zeros(s, w.dtype), axis).reshape(-1)
                for w in domain]
    if n_valid is None:
        idx = ((jnp.arange(s, dtype=jnp.float32) + 0.5)
               * (n_local / s)).astype(jnp.int32)
    else:
        nv = jnp.maximum(n_valid, 1).astype(jnp.float32)
        idx = ((jnp.arange(s, dtype=jnp.float32) + 0.5)
               * (nv / s)).astype(jnp.int32)
        idx = jnp.minimum(idx, jnp.maximum(n_valid - 1, 0))
    return [jax.lax.all_gather(jnp.take(w, idx), axis).reshape(-1)
            for w in domain]


def gather_splitters_parts(parts, axis: str, num_splitters: int,
                           samples_per_shard: int):
    """gather_splitters over several locally sorted buffers pooled into
    one sample (e.g. a join's probe and build tables, each with its own
    valid prefix — concatenating the buffers instead would let invalid
    tails, such as a hot-key run excluded from the exchange, flood the
    quantiles).  `parts` is a list of (domain_words, n_valid_or_None);
    the per-part sample count is proportional to the part's buffer size
    so the pool weights parts like one concatenated sample would."""
    total_local = sum(p[0][0].shape[0] for p in parts) or 1
    nwords = len(parts[0][0])
    pools, valids = [], []
    for domain, n_valid in parts:
        n_local = domain[0].shape[0]
        s = max(1, min(n_local,
                       samples_per_shard * n_local // total_local)) \
            if n_local else 1
        pools.append(sample_strided(domain, axis, s, n_valid))
        # a shard whose valid prefix is empty still contributes s rows
        # (row 0 / zeros) — mark them invalid so they cannot drag the
        # quantiles (e.g. an all-hot join shard whose "cold sample"
        # would otherwise be the hot key itself; round-3 review)
        if n_local == 0:
            v = jnp.zeros(s, jnp.bool_)
        elif n_valid is None:
            v = jnp.ones(s, jnp.bool_)
        else:
            v = jnp.broadcast_to(n_valid > 0, (s,))
        valids.append(jax.lax.all_gather(v, axis).reshape(-1))
    cat = (lambda xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0])
    all_samples = [cat([p[i] for p in pools]) for i in range(nwords)]
    inval = (~cat(valids)).astype(jnp.uint8)
    # invalid samples sort to the tail; quantiles read the valid prefix
    flat = jax.lax.sort((inval,) + tuple(all_samples),
                        num_keys=1 + nwords)[1:]
    n_ok = jnp.sum(inval == 0, dtype=jnp.int32)
    denom = jnp.maximum(n_ok, 1).astype(jnp.float32)
    spl_idx = ((jnp.arange(1, num_splitters + 1, dtype=jnp.float32))
               * (denom / (num_splitters + 1))).astype(jnp.int32)
    spl_idx = jnp.minimum(spl_idx, jnp.maximum(n_ok - 1, 0))
    return tuple(jnp.take(w, spl_idx) for w in flat)


def split_payload_streams(payloads_l, dtypes):
    """64-bit streams travel as u32 (hi, lo) word pairs end to end: the
    TPU X64 rewriter cannot lower ragged-all-to-all (or most 64-bit HLOs)
    on u64, and 32-bit lanes are native anyway.  BIT-preserving: float64
    is bitcast (a value cast would truncate); int64 -> uint64 via astype
    is already bit-identical (two's complement wrap)."""
    ops = []
    for p, dt in zip(payloads_l, dtypes):
        if dt.itemsize == 8:
            if dt.kind == "f":
                p = jax.lax.bitcast_convert_type(p, jnp.uint64)
            hi, lo = transforms.split64(p.astype(jnp.uint64))
            ops.extend([hi, lo])
        else:
            ops.append(p)
    return ops


def merge_payload_streams(ops, dtypes):
    """Inverse of split_payload_streams."""
    out = []
    it = iter(ops)
    for dt in dtypes:
        if dt.itemsize == 8:
            merged = transforms.merge64(next(it), next(it))
            if dt.kind == "f":
                merged = jax.lax.bitcast_convert_type(merged, dt)
            elif dt != merged.dtype:
                merged = merged.astype(dt)
            out.append(merged)
        else:
            out.append(next(it))
    return tuple(out)


def splitter_sort_core(kops, pl_ops, axis: str, num_p: int, cap_recv: int,
                       samples_per_shard: int, use_ragged: bool):
    """The splitter sort's per-device body (call inside shard_map):

      1. local sort of all streams keyed on the key words;
      2. sample/search domain (key words..., pos) — pure u32 words,
         exactly tie-broken by a device-interleaved post-sort position so
         duplicate-heavy inputs stay balanced (a packed-u64 formulation
         silently truncates when x64 is off; pos fits 32 bits for global
         n < 2^32 and is increasing within equal keys, so the domain is
         sorted);
      3. splitters from gathered samples, bucket boundaries in the sorted
         shard, ragged all-to-all over ICI — buckets are contiguous runs
         of the sorted shard, so the shard itself is the send operand,
         zero send-side copies (SURVEY.md section 2.11 "TPU-native
         plan");
      4. final local sort; buffer-padding rows carry an invalid flag as
         the primary key so they collect last.

    `kops` may hold ANY number of lexicographic key words (one 32-bit
    column, a (hi, lo) 64-bit carrier, or several columns' words
    concatenated — the multi-column ORDER BY).  Returns
    (kops_final, pays_final, count, overflow)."""
    my = jax.lax.axis_index(axis)
    n_local = kops[0].shape[0]
    if n_local * num_p >= 2**32:
        raise ValueError(
            f"global rows {n_local * num_p} >= 2^32: the u32 "
            "device-interleaved position tie-break would wrap and "
            "duplicate-heavy inputs would lose their balance guarantee; "
            "split the table into <4B-row sorts")
    nk = len(kops)
    sorted_ops = jax.lax.sort(tuple(kops) + tuple(pl_ops), num_keys=nk,
                              is_stable=False)
    kops_s = sorted_ops[:nk]
    pays_s = sorted_ops[nk:]
    pos = (jnp.arange(n_local, dtype=jnp.uint32)
           * jnp.uint32(num_p) + my.astype(jnp.uint32))
    domain = tuple(kops_s) + (pos,)

    splitters = gather_splitters(domain, axis, num_p - 1, samples_per_shard)
    bounds = lex_bounds(domain, splitters)
    recv_ops, total_recv, overflow = exchange_by_bounds(
        tuple(kops_s) + tuple(pays_s), bounds, axis, cap_recv, use_ragged)

    invalid = (jnp.arange(cap_recv, dtype=jnp.int32)
               >= total_recv).astype(jnp.uint8)
    merged = jax.lax.sort((invalid,) + tuple(recv_ops), num_keys=1 + nk,
                          is_stable=False)
    return (merged[1:1 + nk], merged[1 + nk:],
            total_recv.astype(jnp.int32), overflow)


def splitter_sort_blocked_core(kops, pl_ops, axis: str, num_p: int,
                               cap_seg: int, samples_per_shard: int,
                               use_ragged: bool, segments: int):
    """Blocked-final variant of `splitter_sort_core`: instead of one
    capacity-padded receive buffer finished by a FULL second sort (the
    dominant modeled cost, models/scaling.py), the key domain is cut into
    `num_p * segments` global ranges by finer splitters; each device
    receives its `segments` ranges into segment-aligned sub-buffers
    (`segments` ragged exchanges of one run each) and finishes with ONE
    batched (segments, cap_seg) row sort — the shape that measures
    919-1268 Melem/s on this chip vs ~148 for the full sort
    (BENCH_NOTES.md "Why the engine choices").

    Returns (kops_final, pays_final, counts, overflow) where every stream
    is (segments * cap_seg,) segment-major (valid prefix per segment) and
    counts is (segments,) — `gather_result` consumes this unchanged by
    treating each segment as one more buffer."""
    my = jax.lax.axis_index(axis)
    n_local = kops[0].shape[0]
    if n_local * num_p >= 2**32:
        raise ValueError(
            f"global rows {n_local * num_p} >= 2^32: the u32 "
            "device-interleaved position tie-break would wrap; "
            "split the table into <4B-row sorts")
    K = int(segments)
    nk = len(kops)
    sorted_ops = jax.lax.sort(tuple(kops) + tuple(pl_ops), num_keys=nk,
                              is_stable=False)
    kops_s = sorted_ops[:nk]
    pays_s = sorted_ops[nk:]
    pos = (jnp.arange(n_local, dtype=jnp.uint32)
           * jnp.uint32(num_p) + my.astype(jnp.uint32))
    domain = tuple(kops_s) + (pos,)

    # num_p*K - 1 global fine splitters; device p owns ranges
    # [p*K, (p+1)*K) so segment-major output is globally ordered
    splitters = gather_splitters(domain, axis, num_p * K - 1,
                                 samples_per_shard)
    fine = lex_bounds(domain, splitters)                 # (P*K-1,)
    all_b = jnp.concatenate([jnp.zeros(1, jnp.int32), fine,
                             jnp.full(1, n_local, jnp.int32)])
    dst = jnp.arange(num_p, dtype=jnp.int32) * K

    streams = tuple(kops_s) + tuple(pays_s)
    seg_recv, seg_tot, seg_ov = [], [], []
    for k in range(K):
        starts_k = jnp.take(all_b, dst + k)
        ends_k = jnp.take(all_b, dst + k + 1)
        recv, tot, ov = exchange_by_runs(
            streams, starts_k, ends_k - starts_k, axis, cap_seg, use_ragged)
        seg_recv.append(recv)
        seg_tot.append(tot)
        seg_ov.append(ov)

    counts = jnp.stack(seg_tot).astype(jnp.int32)        # (K,)
    overflow = jnp.stack(seg_ov).max()
    stacked = [jnp.stack([seg_recv[k][i] for k in range(K)])  # (K, cap_seg)
               for i in range(len(streams))]
    invalid = (jnp.arange(cap_seg, dtype=jnp.int32)[None, :]
               < counts[:, None]).astype(jnp.uint8) ^ 1
    merged = jax.lax.sort((invalid,) + tuple(stacked), dimension=1,
                          num_keys=1 + nk, is_stable=False)
    flat = [m.reshape(-1) for m in merged[1:]]
    return (tuple(flat[:nk]), tuple(flat[nk:]), counts, overflow)


def distributed_sort_sharded(keys: jax.Array, payloads, mesh: Mesh,
                             axis: str = DEFAULT_AXIS, ascending: bool = True,
                             capacity_factor: float = 2.0,
                             samples_per_device: int = 256,
                             key_dtype=None, use_ragged: bool | None = None,
                             final_mode: str = "sort",
                             segments_per_device: int = 8):
    """Jittable distributed sort of row-sharded arrays.

    keys/payloads are sharded along the mesh axis (global length n).
    Returns (padded_keys, padded_payloads, counts, overflow) where
    padded_keys is length P*cap per device (sharded), counts is (P,) valid
    rows per device, and overflow flags capacity overrun (results then
    incomplete).

    final_mode: "sort" = one capacity-padded receive buffer finished by a
    full second sort; "blocked" = segment-aligned exchange finished by one
    batched block sort (splitter_sort_blocked_core) — counts is then
    (P * segments_per_device,) globally, one valid-prefix count per
    segment sub-buffer; `gather_result` consumes either shape unchanged.
    """
    num_p = mesh.shape[axis]
    n = keys.shape[0]
    if n % num_p:
        raise ValueError(f"global length {n} not divisible by mesh size {num_p}")
    n_local = n // num_p
    if final_mode not in ("sort", "blocked"):
        raise ValueError(f"unknown final_mode {final_mode!r}")
    K = max(int(segments_per_device), 1)
    cap_recv = max(int(math.ceil(capacity_factor * n_local)), 1)
    # per-segment capacity: same total memory class as the padded buffer;
    # finer ranges see more sampling error, absorbed by the elastic retry
    cap_seg = max(int(math.ceil(capacity_factor * n_local / K)), 1)
    s_per_dev = min(n_local, samples_per_device) or 1

    kdt = np.dtype(key_dtype) if key_dtype is not None else np.dtype(keys.dtype)
    use_ragged = default_use_ragged(use_ragged)

    pl_dtypes = [np.dtype(p.dtype) for p in payloads]

    def _split_payloads(payloads_l):
        return split_payload_streams(payloads_l, pl_dtypes)

    def _merge_payloads(ops):
        return merge_payload_streams(ops, pl_dtypes)

    def local_fn(keys_l, *payloads_l):
        kops = transforms.key_operands(keys_l, ascending, key_dtype)
        payloads_l = _split_payloads(payloads_l)
        if final_mode == "blocked":
            kops_f, pays_f, count, overflow = splitter_sort_blocked_core(
                tuple(kops), tuple(payloads_l), axis, num_p, cap_seg,
                s_per_dev, use_ragged, K)
            count_out, ov_out = count, overflow[None]
        else:
            kops_f, pays_f, count, overflow = splitter_sort_core(
                tuple(kops), tuple(payloads_l), axis, num_p, cap_recv,
                s_per_dev, use_ragged)
            count_out, ov_out = count[None], overflow[None]
        keys_out = transforms.keys_from_operands(
            tuple(kops_f), kdt, ascending, as_bits=key_dtype is not None)
        return (keys_out, _merge_payloads(pays_f), count_out, ov_out)

    shard = functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis),) * (1 + len(payloads)),
        out_specs=(P(axis), tuple(P(axis) for _ in payloads), P(axis), P(axis)),
    )
    return shard(local_fn)(keys, *payloads)


def distributed_sort(keys, *payloads, mesh: Mesh | None = None,
                     axis: str = DEFAULT_AXIS, ascending: bool = True,
                     capacity_factor: float = 2.0,
                     samples_per_device: int = 256,
                     max_retries: int = 2):
    """Host-friendly entry: takes numpy/jax arrays, shards them over the
    mesh, runs the distributed sort, returns
    (padded_keys, payloads, counts, overflow) as device arrays.

    Elastic recovery (SURVEY.md section 5): when sampling error or extreme
    skew overflows the static receive capacity, the sort reruns with the
    capacity factor doubled, up to `max_retries` times — the caller only
    sees an overflow flag if even the widest attempt could not hold the
    buckets."""
    if mesh is None:
        mesh = make_mesh()
    keys, key_dtype = stage_host_bits(keys)
    pl = [stage_host_bits(p) for p in payloads]
    payloads = tuple(p for p, _ in pl)
    meta = {"key_dtype": key_dtype, "payload_dtypes": [dt for _, dt in pl]}

    sharding = NamedSharding(mesh, P(axis))
    keys_d = jax.device_put(jnp.asarray(keys), sharding)
    pays_d = tuple(jax.device_put(jnp.asarray(p), sharding) for p in payloads)
    num_p = mesh.shape[axis]
    cap = capacity_factor
    for attempt in range(max_retries + 1):
        fn = cached_jit(
            ("sort", mesh, axis, ascending, cap, samples_per_device,
             str(key_dtype), keys.shape, keys.dtype.str,
             tuple((p.shape, p.dtype.str) for p in payloads)),
            lambda: functools.partial(
                distributed_sort_sharded, mesh=mesh, axis=axis,
                ascending=ascending, capacity_factor=cap,
                samples_per_device=samples_per_device,
                key_dtype=key_dtype))
        out_keys, out_pays, counts, overflow = fn(keys_d, pays_d)
        if not bool(fetch_flag(overflow).any()):
            break
        # a factor of P always fits everything on one device; past that
        # retrying cannot help
        if attempt == max_retries or cap >= num_p:
            break
        cap = min(cap * 2.0, float(num_p))
    return out_keys, out_pays, counts, overflow, meta



def fetch_flag(x) -> np.ndarray:
    """Host-read a small flag/count array that may be sharded across
    PROCESSES (multi-process runs): np.asarray on a global array spanning
    non-addressable devices raises; process_allgather replicates it
    first.  Single-process arrays take the direct path."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def stage_host_bits(x):
    """Host staging shared by the distributed entries: guard 64-bit mode
    (jnp.asarray silently truncates 64-bit streams when x64 is off) and
    route float64 as u64 bits on lossy-f64 backends (TPU).  Returns
    (array, f64_dtype_or_None)."""
    x = np.asarray(x)
    common.check_64bit_ok(x.dtype)
    if jax.default_backend() != "cpu" and x.dtype == np.float64:
        return x.view(np.uint64), np.dtype(np.float64)
    return x, None


def distributed_sort_multi(keys_columns, *payloads,
                           mesh: Mesh | None = None,
                           axis: str = DEFAULT_AXIS, ascending=True,
                           capacity_factor: float = 2.0,
                           samples_per_device: int = 256,
                           max_retries: int = 2,
                           use_ragged: bool | None = None):
    """Distributed composite ORDER BY: sort row-sharded tables by several
    key columns lexicographically (per-column asc/desc), scaling the
    single-chip `srs.sort_multi` over the mesh.

    Each column's order-preserving carrier words concatenate into the
    splitter-sort core's key-word list — the sampling, tie-break,
    exchange, and merge machinery is identical to the single-key sort.
    Returns (padded_key_columns_tuple, padded_payloads, counts, overflow,
    meta); gather with `gather_result_multi`."""
    if mesh is None:
        mesh = make_mesh()
    keys_columns = tuple(keys_columns)
    if not keys_columns:
        raise ValueError("need at least one key column")
    if isinstance(ascending, bool):
        ascending = (ascending,) * len(keys_columns)
    if len(ascending) != len(keys_columns):
        raise ValueError("one ascending flag per key column")
    lengths = {np.asarray(c).shape[0] for c in keys_columns}
    if len(lengths) != 1:
        raise ValueError(f"key columns differ in length: {sorted(lengths)}")

    staged = [stage_host_bits(c) for c in keys_columns]
    pl_staged = [stage_host_bits(p) for p in payloads]
    col_dtypes = [dt for _, dt in staged]          # f64-as-bits markers
    col_logical = [dt or c.dtype for (c, dt) in staged]
    pl_f64 = [dt for _, dt in pl_staged]
    pl_arrays = tuple(p for p, _ in pl_staged)
    pl_dtypes = [np.dtype(p.dtype) for p in pl_arrays]
    meta = {"key_dtypes": col_dtypes, "payload_dtypes": pl_f64}

    num_p = mesh.shape[axis]
    n = staged[0][0].shape[0]
    if n % num_p:
        raise ValueError(f"global length {n} not divisible by {num_p}")
    s_per_dev = min(n // num_p, samples_per_device) or 1
    use_ragged_b = default_use_ragged(use_ragged)

    sharding = NamedSharding(mesh, P(axis))
    cols_d = tuple(jax.device_put(jnp.asarray(c), sharding)
                   for c, _ in staged)
    pays_d = tuple(jax.device_put(jnp.asarray(p), sharding)
                   for p in pl_arrays)

    def local_fn(cap_recv, *streams):
        cols_l = streams[:len(cols_d)]
        pays_l = streams[len(cols_d):]
        per_col_ops = [transforms.key_operands(c, up, dt)
                       for c, up, dt in zip(cols_l, ascending, col_dtypes)]
        word_counts = [len(ops) for ops in per_col_ops]
        kops = tuple(w for ops in per_col_ops for w in ops)
        pl_ops = split_payload_streams(pays_l, pl_dtypes)

        kops_f, pays_f, count, overflow = splitter_sort_core(
            kops, tuple(pl_ops), axis, num_p, cap_recv, s_per_dev,
            use_ragged_b)

        cols_out = []
        i = 0
        for wcount, up, dt, logical in zip(word_counts, ascending,
                                           col_dtypes, col_logical):
            words = kops_f[i: i + wcount]
            i += wcount
            cols_out.append(transforms.keys_from_operands(
                tuple(words), logical, up, as_bits=dt is not None))
        return (tuple(cols_out),
                merge_payload_streams(pays_f, pl_dtypes),
                count[None], overflow[None])

    shard = functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis),) * (len(cols_d) + len(pays_d)),
        out_specs=(tuple(P(axis) for _ in cols_d),
                   tuple(P(axis) for _ in pays_d), P(axis), P(axis)),
    )
    # elastic recovery, same protocol as distributed_sort: double the
    # receive capacity on overflow until it fits or reaches a full shard
    cap = capacity_factor
    for attempt in range(max_retries + 1):
        cap_recv = max(int(math.ceil(cap * (n // num_p))), 1)
        fn = cached_jit(
            ("sort_multi", mesh, axis, tuple(ascending), cap_recv,
             samples_per_device, use_ragged, n,
             tuple(str(dt) for dt in col_logical),
             tuple(c.dtype.str for c in cols_d),
             tuple((p.shape, p.dtype.str) for p in pays_d)),
            lambda: shard(functools.partial(local_fn, cap_recv)))
        out_cols, out_pays, counts, overflow = fn(*cols_d, *pays_d)
        if not bool(fetch_flag(overflow).any()):
            break
        if attempt == max_retries or cap >= num_p:
            break
        cap = min(cap * 2.0, float(num_p))
    return out_cols, out_pays, counts, overflow, meta


def gather_result_multi(out_cols, out_pays, counts, meta=None):
    """Host-side gather for distributed_sort_multi: concatenate every
    device's valid prefix for each key column and payload."""
    first, rest = gather_result(
        out_cols[0], tuple(out_cols[1:]) + tuple(out_pays), counts)
    ncols = len(out_cols)
    all_streams = [first] + list(rest)
    cols_out = all_streams[:ncols]
    pays_out = all_streams[ncols:]
    if meta:
        for i, dt in enumerate(meta.get("key_dtypes", [])):
            if dt is not None:
                cols_out[i] = cols_out[i].view(dt)
        for i, dt in enumerate(meta.get("payload_dtypes", [])):
            if dt is not None:
                pays_out[i] = pays_out[i].view(dt)
    return tuple(cols_out), tuple(pays_out)


def gather_result(out_keys, out_pays, counts, meta=None):
    """Concatenate each device's valid prefix (host-side) -> sorted table."""
    counts = np.asarray(counts)
    num_p = counts.shape[0]
    ko = np.asarray(out_keys)
    per_dev = ko.shape[0] // num_p
    keys_parts, pay_parts = [], [[] for _ in out_pays]
    for p in range(num_p):
        c = int(counts[p])
        keys_parts.append(ko[p * per_dev: p * per_dev + c])
        for j, pp in enumerate(out_pays):
            pay_parts[j].append(np.asarray(pp)[p * per_dev: p * per_dev + c])
    keys_all = np.concatenate(keys_parts) if keys_parts else ko[:0]
    pays_all = [np.concatenate(pp) for pp in pay_parts]
    if meta:
        if meta.get("key_dtype") is not None:
            keys_all = keys_all.view(meta["key_dtype"])
        for j, dt in enumerate(meta.get("payload_dtypes", [])):
            if dt is not None:
                pays_all[j] = pays_all[j].view(dt)
    return keys_all, tuple(pays_all)
