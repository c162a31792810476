"""Distributed query operators over a jax.sharding.Mesh.

Scale-out of the single-chip operator set (ops/filter, ops/hashagg) — new
scope per the north star (the reference has neither operators nor any
parallelism, SURVEY.md section 2.11).  Same padded static-shape idiom as
parallel/dist_sort: per-device valid counts travel with the data.

  * `distributed_filter` — embarrassingly parallel: each device compacts
    its shard locally; output stays sharded as (packed rows, counts).
  * `distributed_group_aggregate` — two-phase aggregation: per-shard
    group_aggregate, then a KEY-RANGE ragged exchange of the partials so
    device p combines exactly the p-th key range — O(n_local) work and
    traffic per device.  Combinable aggregates only ("sum", "count",
    "min", "max", "mean" — or a tuple of them, all sharing ONE exchange
    with deduped partial streams).
  * `distributed_join` — range-partitioned sort-merge inner join with a
    broadcast path for sampled heavy-hitter keys.
  * `distributed_top_k` — two-level selection: local top-k, k*P-row
    gather, final top-k (exchange independent of n).
  * `distributed_unique` — distinct keys + multiplicities via the same
    key-range partial exchange.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import filter as filter_op
from ..ops import hashagg
from ..ops import hashjoin
from ..utils import common
from ..utils import transforms
from . import dist_sort
from .dist_sort import DEFAULT_AXIS, make_mesh


def _check_divisible(n, mesh, axis, what):
    num_p = mesh.shape[axis]
    if n % num_p:
        raise ValueError(f"{what}: global length {n} not divisible by "
                         f"mesh size {num_p}")


# ---- aggregate partial-stream algebra (shared with parallel/multihost) ----
# each requested aggregate decomposes into partial streams; each partial
# stream has its own cross-shard combine op
PARTIALS = {"sum": ("sum",), "count": ("count",), "min": ("min",),
            "max": ("max",), "mean": ("sum", "count")}
COMBINE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def partial_streams_for(aggs_req):
    """Deduped partial-stream list for a tuple of requested aggregates
    (sum/mean/count families share streams)."""
    partial_aggs = []
    for a in aggs_req:
        for pa in PARTIALS[a]:
            if pa not in partial_aggs:
                partial_aggs.append(pa)
    return tuple(partial_aggs)


def combine_identity(dtype, combine):
    """The combine op's neutral element, for receive-buffer padding."""
    if combine == "sum":
        return dtype.type(0)
    if np.dtype(dtype).kind in "iu":
        info = np.iinfo(dtype)
        return dtype.type(info.max if combine == "min" else info.min)
    return dtype.type(np.inf if combine == "min" else -np.inf)


def stage_aggregate_inputs(keys, values, agg, what):
    """Shared host-side validation/staging for the distributed aggregate
    entries (flat and hierarchical).  Returns
    (aggs_req, keys_bits, key_f64, values)."""
    aggs_req = (agg,) if isinstance(agg, str) else tuple(agg)
    if not aggs_req:
        raise ValueError(f"{what}: empty agg tuple")
    for a in aggs_req:
        if a not in PARTIALS:
            raise ValueError(f"{what}: unsupported aggregate {a!r}")
    keys, key_f64 = dist_sort.stage_host_bits(np.asarray(keys))
    values = np.asarray(values)
    if values.shape[0] != keys.shape[0]:
        raise ValueError(f"values length {values.shape[0]} != keys "
                         f"length {keys.shape[0]}")
    # values do arithmetic on device, so they get the same 64-bit-mode
    # guard as keys (jnp.asarray would silently truncate int64 with x64
    # off), and f64 values cannot ride the bits-staging trick — on
    # lossy-f64 backends the sums would be silently approximate
    common.check_64bit_ok(values.dtype)
    if jax.default_backend() not in ("cpu",) and values.dtype == np.float64:
        raise NotImplementedError(
            "float64 aggregate values on a lossy-f64 backend would be "
            "silently inexact; cast values to float32/int64 or run on CPU")
    return aggs_req, keys, key_f64, values


def run_elastic_aggregate(make_fn, keys_d, vals_d, n_local, num_p,
                          capacity_factor, max_retries, what):
    """Elastic-capacity retry loop shared by the aggregate entries:
    `make_fn(cap_recv)` builds the jitted step; capacity doubles on
    overflow up to max_retries; raises if even the widest attempt
    overflowed.  Returns the final out tuple (overflow flag last)."""
    cap = capacity_factor
    for attempt in range(max_retries + 1):
        cap_recv = max(int(cap * n_local), 1)
        out = make_fn(cap_recv)(keys_d, vals_d)
        if not bool(dist_sort.fetch_flag(out[-1]).any()):
            break
        if attempt == max_retries or cap >= num_p:
            break
        cap = min(cap * 2.0, float(num_p))
    if bool(dist_sort.fetch_flag(out[-1]).any()):
        raise ValueError(
            f"{what}: a key range's partials exceed receive capacity even "
            f"at factor {cap}; groups are too skewed for the per-device "
            "buffer")
    return out


def assemble_aggregate_result(out, agg, aggs_req, partial_aggs, key_f64):
    """Gather per-device group tables (device order IS key-ascending) and
    unpack partial totals into the requested aggregates."""
    counts, gks, totals = out[0], out[1], out[2:-1]
    gk_out, tot = dist_sort.gather_result(gks, tuple(totals), counts)
    if key_f64 is not None:
        gk_out = gk_out.view(key_f64)
    ng = int(np.asarray(counts).sum())
    tot = [np.asarray(t) for t in tot]  # combined partials, partial_aggs order
    slot = {pa: i for i, pa in enumerate(partial_aggs)}

    def result_for(a):
        if a == "mean":
            return tot[slot["sum"]] / tot[slot["count"]].astype(np.float64)
        return tot[slot[PARTIALS[a][0]]]

    if isinstance(agg, str):
        return ng, gk_out, result_for(agg)
    return ng, gk_out, tuple(result_for(a) for a in aggs_req)


def combine_received_partials(recv, nk, part_dts, partial_aggs,
                              total_recv, cap_recv):
    """Combine exchanged partial rows into per-group totals.

    `recv` holds nk carrier word streams followed by the partial-value
    streams (as split u32 ops, `dist_sort.split_payload_streams` layout).
    Invalid (buffer-padding) rows must not perturb any group they collide
    with (recv padding is all-zero words -> key 0): they get each stream's
    combine identity, and validity travels as its OWN stream with a
    max-combine (a group is real iff ANY contributor was valid).

    Returns (num_real_groups, carrier_groups, totals_list): real groups
    compacted to the front in ascending carrier order; rows past
    num_real_groups are junk the caller must mask.
    """
    gc_recv = transforms.merge64(*recv[:nk]) if nk == 2 else recv[0]
    parts_recv = dist_sort.merge_payload_streams(recv[nk:], part_dts)
    rvalid = jnp.arange(cap_recv, dtype=jnp.int32) < total_recv
    parts_recv = [
        jnp.where(rvalid, p, combine_identity(p.dtype, COMBINE[pa]))
        for pa, p in zip(partial_aggs, parts_recv)]
    vstream = rvalid.astype(jnp.int32)
    # one combine group_aggregate: each partial stream under its own
    # combine op, plus the validity stream under max
    combine_ops = []
    streams_per_op = {}
    for i, pa in enumerate(partial_aggs):
        op = COMBINE[pa]
        if op not in streams_per_op:
            combine_ops.append(op)
            streams_per_op[op] = []
        streams_per_op[op].append(i)
    ng2, gk2c, res_all = hashagg.group_aggregate(
        gc_recv, tuple(parts_recv) + (vstream,),
        aggs=tuple(combine_ops) + ("max",),
        agg_streams=tuple(tuple(streams_per_op[op])
                          for op in combine_ops) + ((len(parts_recv),),))
    totals = [None] * len(partial_aggs)
    for op, res in zip(combine_ops, res_all[:-1]):
        for j, i in enumerate(streams_per_op[op]):
            totals[i] = res[j]
    vres = res_all[-1][0]
    rows = jnp.arange(cap_recv, dtype=jnp.int32)
    real = (vres == 1) & (rows < ng2)
    cnt, gk_fc, *tot_f = filter_op.compact(real, gk2c, *totals)
    return cnt, gk_fc, list(tot_f)


def distributed_filter(predicate, keys, *payloads, mesh: Mesh | None = None,
                       axis: str = DEFAULT_AXIS):
    """Filter a row-sharded table.  Returns (counts, keys, payloads...):
    each device's selected rows packed at the front of its shard, with a
    per-device valid count (P,)."""
    if mesh is None:
        mesh = make_mesh()
    keys = np.asarray(keys)
    pays = [np.asarray(p) for p in payloads]
    # same 64-bit-mode guard as every other distributed entry: without it
    # jnp.asarray silently truncates int64/uint64 streams when x64 is
    # off and the predicate filters corrupted values (round-3 review)
    for arr in [keys] + pays:
        common.check_64bit_ok(arr.dtype)
        if jax.default_backend() != "cpu" and arr.dtype == np.float64:
            raise NotImplementedError(
                "float64 streams on a lossy-f64 backend cannot be "
                "filtered in logical form; view them as uint64 bits "
                "(.view(np.uint64)) and filter on bits, or run on CPU")
    _check_divisible(keys.shape[0], mesh, axis, "distributed_filter keys")
    sharding = NamedSharding(mesh, P(axis))
    keys_d = jax.device_put(jnp.asarray(keys), sharding)
    pays_d = tuple(jax.device_put(jnp.asarray(p), sharding) for p in pays)

    def local(k, *ps):
        out = filter_op.filter_rows(predicate, k, *ps)
        return (out[0][None],) + tuple(out[1:])

    fn = dist_sort.cached_jit(
        # the predicate object itself is the key (id() could be reused
        # after GC); the cache's FIFO cap bounds the resulting liveness
        ("filter", mesh, axis, predicate, keys.shape, keys.dtype.str,
         tuple((p.shape, p.dtype.str) for p in pays)),
        lambda: jax.shard_map(
            local, mesh=mesh, in_specs=(P(axis),) * (1 + len(payloads)),
            out_specs=(P(axis),) * (2 + len(payloads))))
    out = fn(keys_d, *pays_d)
    return out[0], out[1], tuple(out[2:])


def gather_filtered(counts, keys, payloads=()):
    """Host-side: concatenate each device's valid prefix (same padded-
    prefix protocol as the distributed sort's output)."""
    from .dist_sort import gather_result
    return gather_result(keys, tuple(payloads), counts)


def distributed_group_aggregate(keys, values, agg: str = "sum",
                                mesh: Mesh | None = None,
                                axis: str = DEFAULT_AXIS,
                                capacity_factor: float = 2.0,
                                samples_per_device: int = 128,
                                max_retries: int = 2,
                                use_ragged: bool | None = None):
    """Aggregate values per distinct key across the whole mesh.

    Two-phase with a KEY-RANGE exchange of partials (round-2 VERDICT item
    6): per-shard partial aggregates, then each device's partial rows are
    range-partitioned by shared splitters over the group-key domain and
    ragged-exchanged (`dist_sort.exchange_by_bounds`) so device p combines
    exactly the partials of the p-th key range — O(n_local) work and
    traffic per device, NOT the old O(P * n_local) replicated all_gather.
    Group count is bounded per key range (capacity_factor * n_local per
    device, elastic-doubled on overflow up to `max_retries`), not by n/P
    globally.

    Returns (num_groups, group_keys, result) as host arrays, group keys
    globally ascending.  agg is one of {"sum", "count", "min", "max",
    "mean"} or a TUPLE of them — a tuple computes every requested
    aggregate in the same single exchange (shared partials are deduped:
    "mean" travels as (sum, count), so requesting ("sum", "mean",
    "count") ships exactly two partial streams) and returns a tuple of
    results in request order.

    Float keys group by IEEE-754 totalOrder bit-distinctness, exactly
    like the single-chip sort/group_aggregate (-0.0 is its own group
    below +0.0, NaN bit patterns are distinct groups) — the same on
    every backend."""
    aggs_req, keys, key_f64, values = stage_aggregate_inputs(
        keys, values, agg, "distributed_group_aggregate")
    if mesh is None:
        mesh = make_mesh()
    num_p = mesh.shape[axis]
    use_ragged = dist_sort.default_use_ragged(use_ragged)
    _check_divisible(keys.shape[0], mesh, axis,
                     "distributed_group_aggregate keys")
    n_local = keys.shape[0] // num_p
    sharding = NamedSharding(mesh, P(axis))
    keys_d = jax.device_put(jnp.asarray(keys), sharding)
    vals_d = jax.device_put(jnp.asarray(values), sharding)
    key_dtype = key_f64 or keys.dtype

    partial_aggs = partial_streams_for(aggs_req)

    def local(cap_recv, k, v):
        # BOTH grouping phases run on the TRANSFORMED CARRIER (the
        # order-preserving unsigned image of the key): exchange_by_bounds
        # ships contiguous ranges of the grouped valid prefix, so that
        # prefix must be sorted in the same lex order the splitters and
        # bounds use.  Grouping on the raw staged bits instead misroutes
        # f64 partials (u64 bit order != float order for negatives) —
        # round-3 review finding, regression-tested in test_dist_ops.
        kw = transforms.key_operands(k, True, logical_dtype=key_f64)
        nk = len(kw)
        carrier = transforms.merge64(*kw) if nk == 2 else kw[0]
        cmax = carrier.dtype.type(~np.uint64(0) if nk == 2
                                  else ~np.uint32(0))
        ng, gkc, results = hashagg.group_aggregate(carrier, v,
                                                   aggs=partial_aggs)
        parts = [res if pa == "count" else res[0]
                 for pa, res in zip(partial_aggs, results)]
        part_dts = [np.dtype(p.dtype) for p in parts]
        n_l = k.shape[0]
        valid = jnp.arange(n_l, dtype=jnp.int32) < ng

        # the padded tail (rows >= ng, junk keys) is forced to the
        # carrier maximum so lex_bounds never counts it below a splitter
        # (splitters come from the valid prefix, so no real bucket ever
        # starts past the forced tail)
        gkc = jnp.where(valid, gkc, cmax)
        kops = transforms.split64(gkc) if nk == 2 else (gkc,)
        # key-domain splitters only (NO position tie-break): all partials
        # of one key must land on one device, exactly like the join
        splitters = dist_sort.gather_splitters(
            kops, axis, num_p - 1, samples_per_device, n_valid=ng)
        part_ops = dist_sort.split_payload_streams(parts, part_dts)
        recv, total_recv, overflow = dist_sort.exchange_by_bounds(
            kops + tuple(part_ops), dist_sort.lex_bounds(kops, splitters),
            axis, cap_recv, use_ragged, n_valid=ng)
        cnt, gk_fc, tot_f = combine_received_partials(
            recv, nk, part_dts, partial_aggs, total_recv, cap_recv)
        # carrier back to logical keys (f64 exits as bits, viewed on host)
        wf = transforms.split64(gk_fc) if nk == 2 else (gk_fc,)
        gk_f = transforms.keys_from_operands(
            tuple(wf), key_dtype, True, as_bits=key_f64 is not None)
        return (cnt[None], gk_f) + tuple(tot_f) + (overflow[None],)

    def make_fn(cap_recv):
        return dist_sort.cached_jit(
            ("aggregate", mesh, axis, aggs_req, cap_recv, samples_per_device,
             use_ragged, str(key_f64), keys.shape, keys.dtype.str,
             values.dtype.str),
            lambda: jax.shard_map(
                lambda k, v: local(cap_recv, k, v), mesh=mesh,
                in_specs=(P(axis), P(axis)),
                out_specs=(P(axis),) * (3 + len(partial_aggs))))

    out = run_elastic_aggregate(make_fn, keys_d, vals_d, n_local, num_p,
                                capacity_factor, max_retries,
                                "distributed_group_aggregate")
    return assemble_aggregate_result(out, agg, aggs_req, partial_aggs,
                                     key_f64)


def _hot_keys_from_sample(domain, axis: str, samples_per_shard: int,
                          h: int, min_count: int):
    """Top-`h` most frequent keys in a gathered strided sample of ONE
    table's multi-word key domain (each with >= min_count sample
    occurrences).  Per-table on purpose: pooling both join sides dilutes
    a key that is hot on the smaller table below any fixed threshold
    (round-3 review).  Deterministic and computed from an all_gathered
    sample, so every device derives the IDENTICAL hot list.  Returns
    (words tuple of (h',) arrays, valid (h',) bool), h' <= h."""
    n_local = domain[0].shape[0]
    s = min(n_local, samples_per_shard) or 1
    if n_local == 0:  # empty table: no hot keys (don't score the zeros)
        return (tuple(jnp.zeros(1, w.dtype) for w in domain),
                jnp.zeros(1, jnp.bool_))
    samples = dist_sort.sample_strided(domain, axis, s)
    swords = jax.lax.sort(tuple(samples), num_keys=len(domain))
    swords = swords if isinstance(swords, (tuple, list)) else (swords,)
    total = swords[0].shape[0]
    neq = jnp.zeros(total, jnp.bool_)
    for w in swords:
        neq = neq | (w != jnp.roll(w, 1))
    neq = neq.at[0].set(True)
    pos = jnp.arange(total, dtype=jnp.int32)
    run_start = jax.lax.cummax(jnp.where(neq, pos, 0))
    run_len = pos - run_start + 1
    is_last = jnp.roll(neq, -1).at[total - 1].set(True)
    score = jnp.where(is_last, run_len, -1)  # run length at its last row
    counts, top_pos = jax.lax.top_k(score, min(h, total))
    words = tuple(jnp.take(w, top_pos) for w in swords)
    return words, counts >= min_count


def _match_any(domain, hot_words, hot_valid):
    """Row mask: does the row's multi-word key equal ANY (valid) hot key?
    O(n * h) broadcast compare — h is small (default 8)."""
    eq = jnp.ones((domain[0].shape[0], hot_words[0].shape[0]), jnp.bool_)
    for w, hw in zip(domain, hot_words):
        eq = eq & (w[:, None] == hw[None, :])
    return jnp.any(eq & hot_valid[None, :], axis=1)


def distributed_join(probe_keys, probe_payloads, build_keys, build_payloads,
                     mesh: Mesh | None = None, axis: str = DEFAULT_AXIS,
                     capacity_factor: float = 2.0,
                     out_rows_per_device: int | None = None,
                     samples_per_device: int = 128,
                     use_ragged: bool | None = None,
                     hot_keys: int = 8,
                     hot_min_count: int | None = None,
                     hot_rows_per_device: int | None = None,
                     return_hot_stats: bool = False):
    """Mesh inner join: range-partition BOTH tables by shared splitters,
    ragged-exchange each side over ICI, sort-merge join locally.

    The splitter domain is the key alone (no position tie-break, unlike
    the distributed sort): equal keys MUST co-locate on one device so
    every match pair meets.  Splitters are sampled from both tables, so a
    key range that is heavy on either side gets boundaries.  This is the
    natural mesh join given the splitter sort already range-partitions
    keys (round-1 VERDICT item 1 / SURVEY.md section 7 step 5 scaled out).

    HEAVY HITTERS (round-2 VERDICT item 5): a single key whose rows
    exceed a receive buffer can never be range-partitioned (equal keys
    co-locate), so the top-`hot_keys` most frequent keys of EACH table's
    gathered sample (>= hot_min_count occurrences of that table's
    sample, default half the overflow frequency; every device derives
    the same lists) take a broadcast-join path instead: their BUILD rows
    are all_gathered to every device and their PROBE rows never move —
    each device joins its local hot probe rows against the replicated
    hot build table, while cold keys use the range exchange as before.
    This is the skew-repartitioning of north-star config 5; hot_keys=0
    disables it.  The hot machinery costs a constant factor even when the
    sample finds nothing hot (the flag sort, a one-shard hot-window
    gather, and a second local merge join are unconditional — static
    shapes; a data-dependent skip would put collectives under lax.cond) —
    set hot_keys=0 for workloads known to be uniform.  `hot_rows_per_device` caps one device's CONTRIBUTED
    hot build rows (default n_build/P^2, so the gathered hot table
    totals one build shard — the same memory class as a receive buffer);
    oversized hot tails set the overflow flag.

    Returns (counts, out_keys, out_probe_payloads, out_build_payloads,
    overflow): per-device padded outputs — device p holds matches for the
    p-th key range followed by its local hot-key matches, `counts[p]`
    valid rows each, packed at the front.  overflow flags a receive-
    buffer, hot-replication, or output-capacity overrun (rerun with a
    larger factor / out_rows_per_device).  Keys of both tables must share
    one dtype.

    return_hot_stats=True appends a `hot_stats` dict before `meta`:
    per-device hot PROBE/BUILD row counts and the (replicated) number of
    hot key slots the sampler flagged — the committed heavy-hitter
    statistics of north-star config 5.
    """
    if mesh is None:
        mesh = make_mesh()
    num_p = mesh.shape[axis]
    use_ragged = dist_sort.default_use_ragged(use_ragged)
    probe_keys = np.asarray(probe_keys)
    build_keys = np.asarray(build_keys)
    if probe_keys.dtype != build_keys.dtype:
        raise ValueError("probe and build key dtypes must match")
    # float64 never lives on a TPU device (lossy emulated storage; f64
    # bitcasts cannot lower) — stage f64 keys/payloads as u64 bits, hand
    # bits back through meta like distributed_sort does
    probe_keys, key_f64 = dist_sort.stage_host_bits(probe_keys)
    build_keys, _ = dist_sort.stage_host_bits(build_keys)
    pp_staged = [dist_sort.stage_host_bits(p) for p in probe_payloads]
    bp_staged = [dist_sort.stage_host_bits(p) for p in build_payloads]
    probe_payloads = tuple(p for p, _ in pp_staged)
    build_payloads = tuple(p for p, _ in bp_staged)
    meta = {"key_dtype": key_f64,
            "probe_payload_dtypes": [dt for _, dt in pp_staged],
            "build_payload_dtypes": [dt for _, dt in bp_staged]}
    for name, arr in (("probe", probe_keys), ("build", build_keys)):
        if arr.shape[0] % num_p:
            raise ValueError(f"{name} rows {arr.shape[0]} not divisible by "
                             f"mesh size {num_p}")
    n_lp = probe_keys.shape[0] // num_p
    n_lb = build_keys.shape[0] // num_p
    cap_p = int(capacity_factor * n_lp)
    cap_b = int(capacity_factor * n_lb)
    cap_out = out_rows_per_device or 2 * (n_lp + n_lb)
    # hot-replication budget: the gathered hot table is P * cap_hot rows
    # per device, so the default caps it at ONE build shard total — the
    # same memory class as the cold receive buffers, not a full-table
    # replication (round-3 review).  Oversized hot tails raise the
    # overflow flag; callers with genuinely heavier hot mass pass
    # hot_rows_per_device explicitly.
    cap_hot = hot_rows_per_device or max(128, n_lb // num_p)
    # a key only endangers a receive buffer when its frequency in ITS
    # table approaches capacity_factor/P; in that table's gathered
    # sample (s rows/device) that is s * capacity_factor expected hits —
    # demand half, independent of mesh size (an absolute bar would sink
    # as P grows and route ordinary keys through the broadcast path;
    # round-3 review)
    def _mc(n_l):
        return hot_min_count if hot_min_count is not None else max(
            2, int(min(n_l, samples_per_device) * capacity_factor / 2))

    mc_p, mc_b = _mc(n_lp), _mc(n_lb)

    p_dts = [np.dtype(np.asarray(p).dtype) for p in probe_payloads]
    b_dts = [np.dtype(np.asarray(p).dtype) for p in build_payloads]

    sharding = NamedSharding(mesh, P(axis))
    put = lambda x: jax.device_put(jnp.asarray(np.asarray(x)), sharding)
    pk, bk = put(probe_keys), put(build_keys)
    pp = tuple(put(p) for p in probe_payloads)
    bp = tuple(put(p) for p in build_payloads)

    def local(pk_l, bk_l, *pays):
        pp_l = pays[:len(p_dts)]
        bp_l = pays[len(p_dts):]
        kops_p = transforms.key_operands(pk_l, True, logical_dtype=key_f64)
        kops_b = transforms.key_operands(bk_l, True, logical_dtype=key_f64)
        nk = len(kops_p)
        pp_ops = dist_sort.split_payload_streams(pp_l, p_dts)
        bp_ops = dist_sort.split_payload_streams(bp_l, b_dts)
        # an empty table makes hot handling moot (no matches possible)
        # and its 0-row buffers cannot be gathered from
        use_hot = hot_keys > 0 and n_lp > 0 and n_lb > 0

        if use_hot:
            # per-table hot lists (a key hot on EITHER side must be
            # broadcast — sampling the concatenation would dilute a key
            # that dominates only the smaller table), unioned; identical
            # on every device (all_gathered samples, see helper)
            hw_p, hv_p = _hot_keys_from_sample(
                kops_p, axis, samples_per_device, hot_keys, mc_p)
            hw_b, hv_b = _hot_keys_from_sample(
                kops_b, axis, samples_per_device, hot_keys, mc_b)
            hot_words = tuple(jnp.concatenate([a, b])
                              for a, b in zip(hw_p, hw_b))
            hot_valid = jnp.concatenate([hv_p, hv_b])
            flag_p = _match_any(kops_p, hot_words,
                                hot_valid).astype(jnp.uint8)
            flag_b = _match_any(kops_b, hot_words,
                                hot_valid).astype(jnp.uint8)
            # one local sort keyed (hot_flag, key words): the cold prefix
            # [0, n_cold) is key-sorted and contiguous for the exchange,
            # hot rows collect at the tail
            sp = jax.lax.sort((flag_p,) + tuple(kops_p) + tuple(pp_ops),
                              num_keys=1 + nk)
            sb = jax.lax.sort((flag_b,) + tuple(kops_b) + tuple(bp_ops),
                              num_keys=1 + nk)
            flag_ps, dom_p, pp_s = sp[0], sp[1:1 + nk], sp[1 + nk:]
            flag_bs, dom_b, bp_s = sb[0], sb[1:1 + nk], sb[1 + nk:]
            n_cold_p = jnp.sum((flag_ps == 0).astype(jnp.int32))
            n_cold_b = jnp.sum((flag_bs == 0).astype(jnp.int32))
        else:
            # local sort each side by key (buckets become contiguous runs)
            sp = jax.lax.sort(tuple(kops_p) + tuple(pp_ops), num_keys=nk)
            sb = jax.lax.sort(tuple(kops_b) + tuple(bp_ops), num_keys=nk)
            dom_p, pp_s = sp[:nk], sp[nk:]
            dom_b, bp_s = sb[:nk], sb[nk:]
            n_cold_p = n_cold_b = None

        # shared splitters pooled from BOTH tables' samples (key domain
        # only: equal keys co-locate).  In hot mode only the COLD
        # prefixes are sampled — hot rows never enter the exchange, and
        # letting a 50%-frequency key flood the sample would collapse
        # half the quantile splitters onto it and concentrate the cold
        # rows on half the mesh (round-3 review finding)
        splitters = dist_sort.gather_splitters_parts(
            [(tuple(dom_p), n_cold_p), (tuple(dom_b), n_cold_b)],
            axis, num_p - 1, samples_per_device)

        if use_hot:
            # bounds over the cold prefix only: lexicographic compare with
            # a leading zero flag word excludes every hot (flag=1) row
            zspl = (jnp.zeros(splitters[0].shape, jnp.uint8),)
            bounds_p = dist_sort.lex_bounds((flag_ps,) + tuple(dom_p),
                                            zspl + splitters)
            bounds_b = dist_sort.lex_bounds((flag_bs,) + tuple(dom_b),
                                            zspl + splitters)
            nv_p, nv_b = n_cold_p, n_cold_b
        else:
            bounds_p = dist_sort.lex_bounds(dom_p, splitters)
            bounds_b = dist_sort.lex_bounds(dom_b, splitters)
            nv_p = nv_b = None

        recv_p, tot_p, ov_p = dist_sort.exchange_by_bounds(
            tuple(dom_p) + tuple(pp_s), bounds_p, axis, cap_p, use_ragged,
            n_valid=nv_p)
        recv_b, tot_b, ov_b = dist_sort.exchange_by_bounds(
            tuple(dom_b) + tuple(bp_s), bounds_b, axis, cap_b, use_ragged,
            n_valid=nv_b)

        total_c, pidx_c, bidx_c = hashjoin.merge_join_indices(
            tuple(recv_p[:nk]), tot_p, tuple(recv_b[:nk]), tot_b, cap_out)
        count_c = jnp.minimum(total_c, cap_out).astype(jnp.int32)
        valid_c = jnp.arange(cap_out, dtype=jnp.int32) < count_c
        ov_out_cold = jax.lax.pmax((total_c > cap_out).astype(jnp.int32),
                                   axis)
        ov = ov_p + ov_b + ov_out_cold
        ov_hotcap = ov_out_hot = jnp.int32(0)

        def g(words, idx, valid):
            # a 0-capacity stream (empty table side) yields zeros: takes
            # from an empty axis do not lower
            return tuple(jnp.where(valid, jnp.take(w, idx), 0)
                         if w.shape[0] else jnp.zeros(idx.shape, w.dtype)
                         for w in words)

        out_kops = g(recv_p[:nk], pidx_c, valid_c)
        out_pp = g(recv_p[nk:], pidx_c, valid_c)
        out_bp = g(recv_b[nk:], bidx_c, valid_c)
        count = count_c

        if use_hot:
            # broadcast join for the hot keys: replicate every device's
            # hot BUILD rows (the tail run [n_cold_b, n_b)), join LOCAL
            # hot probe rows against the replicated table — no exchange
            # can overflow on a hot key because hot rows never enter it
            n_b_l = dom_b[0].shape[0]
            n_hot_b = jnp.int32(n_b_l) - n_cold_b
            idx_hb = jnp.clip(
                n_cold_b + jnp.arange(cap_hot, dtype=jnp.int32),
                0, max(n_b_l - 1, 0))
            hot_all = [jax.lax.all_gather(jnp.take(s, idx_hb),
                                          axis).reshape(-1)
                       for s in tuple(dom_b) + tuple(bp_s)]
            vmask_hb = jax.lax.all_gather(
                jnp.arange(cap_hot, dtype=jnp.int32) < n_hot_b,
                axis).reshape(-1)
            ov_hotcap = jax.lax.pmax((n_hot_b > cap_hot).astype(jnp.int32),
                                     axis)
            ov = ov + ov_hotcap

            total_h, pidx_h, bidx_h = hashjoin.merge_join_indices(
                tuple(dom_p), flag_ps == 1, tuple(hot_all[:nk]), vmask_hb,
                cap_out)
            count_h = jnp.minimum(total_h, cap_out).astype(jnp.int32)
            valid_h = jnp.arange(cap_out, dtype=jnp.int32) < count_h
            ov_out_hot = jax.lax.pmax((total_h > cap_out).astype(jnp.int32),
                                      axis)
            ov = ov + ov_out_hot

            hk = g(dom_p, pidx_h, valid_h)
            hp = g(pp_s, pidx_h, valid_h)
            hb = g(hot_all[nk:], bidx_h, valid_h)
            # compact [cold valid | hot valid | padding] in one stable sort
            inval = jnp.concatenate([~valid_c, ~valid_h]).astype(jnp.uint8)
            streams = tuple(jnp.concatenate([c, h]) for c, h in zip(
                out_kops + out_pp + out_bp, hk + hp + hb))
            packed = jax.lax.sort((inval,) + streams, num_keys=1,
                                  is_stable=True)[1:]
            npw, nbw = len(pp_s), len(bp_s)
            out_kops = packed[:nk]
            out_pp = packed[nk:nk + npw]
            out_bp = packed[nk + npw: nk + npw + nbw]
            count = count_c + count_h

        keys_out = transforms.keys_from_operands(
            tuple(out_kops), key_f64 or pk_l.dtype, True,
            as_bits=key_f64 is not None)
        out_pp = dist_sort.merge_payload_streams(out_pp, p_dts)
        out_bp = dist_sort.merge_payload_streams(out_bp, b_dts)
        base_out = (count[None], keys_out) + out_pp + out_bp + (ov[None],)
        if not return_hot_stats:
            return base_out
        if use_hot:
            hs = (jnp.int32(dom_p[0].shape[0]) - n_cold_p,
                  jnp.int32(dom_b[0].shape[0]) - n_cold_b,
                  jnp.sum(hot_valid.astype(jnp.int32)))
        else:
            hs = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
        # per-source overflow components, for diagnosing WHICH capacity
        # tripped (probe recv / build recv / cold out / hot out / hot table)
        ov_parts = jnp.stack([ov_p, ov_b, ov_out_cold, ov_out_hot,
                              ov_hotcap]).astype(jnp.int32)
        return base_out + tuple(h[None] for h in hs) + (ov_parts[None],)

    n_out = 2 + len(p_dts) + len(b_dts) + 1 + (4 if return_hot_stats else 0)
    fn = dist_sort.cached_jit(
        ("join", mesh, axis, cap_p, cap_b, cap_out, cap_hot, hot_keys,
         mc_p, mc_b, samples_per_device, use_ragged, str(key_f64),
         return_hot_stats,
         probe_keys.shape, build_keys.shape, probe_keys.dtype.str,
         tuple(dt.str for dt in p_dts), tuple(dt.str for dt in b_dts)),
        lambda: jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis),) * (2 + len(p_dts) + len(b_dts)),
            out_specs=(P(axis),) * n_out))
    out = fn(pk, bk, *pp, *bp)
    counts, keys_out = out[0], out[1]
    out_pp = tuple(out[2: 2 + len(p_dts)])
    out_bp = tuple(out[2 + len(p_dts): 2 + len(p_dts) + len(b_dts)])
    iov = 2 + len(p_dts) + len(b_dts)
    overflow = out[iov]
    if return_hot_stats:
        hot_stats = {"hot_probe_rows_per_device": out[iov + 1],
                     "hot_build_rows_per_device": out[iov + 2],
                     "hot_key_slots_flagged": out[iov + 3],
                     "overflow_parts_probe_build_coldout_hotout_hotcap":
                         out[iov + 4]}
        return counts, keys_out, out_pp, out_bp, overflow, hot_stats, meta
    return counts, keys_out, out_pp, out_bp, overflow, meta


def gather_joined(counts, keys, probe_payloads=(), build_payloads=(),
                  meta=None):
    """Host-side: concatenate each device's valid join-output prefix;
    `meta` (from distributed_join) views f64-as-bits streams back."""
    from .dist_sort import gather_result
    k, pays = gather_result(keys, tuple(probe_payloads)
                            + tuple(build_payloads), counts)
    npp = len(probe_payloads)
    pp_out, bp_out = list(pays[:npp]), list(pays[npp:])
    if meta:
        if meta.get("key_dtype") is not None:
            k = k.view(meta["key_dtype"])
        for i, dt in enumerate(meta.get("probe_payload_dtypes", [])):
            if dt is not None:
                pp_out[i] = pp_out[i].view(dt)
        for i, dt in enumerate(meta.get("build_payload_dtypes", [])):
            if dt is not None:
                bp_out[i] = bp_out[i].view(dt)
    return k, tuple(pp_out), tuple(bp_out)


def distributed_top_k(keys, *payloads, k: int, largest: bool = True,
                      mesh: Mesh | None = None, axis: str = DEFAULT_AXIS):
    """k extreme rows across the whole mesh: local top-k per shard, then a
    k*P-row all_gather and one final local top-k (the classic two-level
    selection — exchange volume is k*P rows, independent of n).

    Returns (keys_k, payloads_k...) as host arrays, best-first."""
    from ..ops import topk
    if mesh is None:
        mesh = make_mesh()
    # 64-bit guard + f64-as-bits staging, like every distributed entry:
    # bare jnp.asarray silently truncated int64 keys with x64 off and
    # returned the wrong rows (round-3 review, confirmed repro)
    keys, key_f64 = dist_sort.stage_host_bits(np.asarray(keys))
    staged = [dist_sort.stage_host_bits(np.asarray(p)) for p in payloads]
    pays = [p for p, _ in staged]
    pay_f64 = [dt for _, dt in staged]
    _check_divisible(keys.shape[0], mesh, axis, "distributed_top_k keys")
    if k > keys.shape[0]:
        raise ValueError(f"k={k} exceeds global row count {keys.shape[0]}")
    sharding = NamedSharding(mesh, P(axis))
    keys_d = jax.device_put(jnp.asarray(keys), sharding)
    pays_d = tuple(jax.device_put(jnp.asarray(p), sharding) for p in pays)

    def local(kk, *ps):
        loc = topk.top_k(kk, *ps, k=min(k, kk.shape[0]), largest=largest,
                         key_dtype=key_f64)
        gathered = [jax.lax.all_gather(s, axis).reshape(-1) for s in loc]
        fin = topk.top_k(gathered[0], *gathered[1:], k=k, largest=largest,
                         key_dtype=key_f64)
        return tuple(f[None] for f in fin)  # replicated -> per-device row

    fn = dist_sort.cached_jit(
        ("top_k", mesh, axis, k, largest, str(key_f64), keys.shape,
         keys.dtype.str, tuple((p.shape, p.dtype.str) for p in pays)),
        lambda: jax.shard_map(
            local, mesh=mesh, in_specs=(P(axis),) * (1 + len(payloads)),
            out_specs=(P(axis),) * (1 + len(payloads))))
    out = fn(keys_d, *pays_d)
    # all devices hold identical answers; take the first device's row
    host = [np.asarray(o)[0] for o in out]
    if key_f64 is not None:
        host[0] = host[0].view(key_f64)
    for i, dt in enumerate(pay_f64):
        if dt is not None:
            host[1 + i] = host[1 + i].view(dt)
    return tuple(host)


def distributed_unique(keys, mesh: Mesh | None = None,
                       axis: str = DEFAULT_AXIS, **kw):
    """Distinct keys across the whole mesh with multiplicities — the mesh
    analogue of ops.topk.unique (the reference has no distributed tier;
    SURVEY.md section 2.11).

    A thin composition over the key-range partial-aggregate exchange
    (`distributed_group_aggregate(..., "count")`): per-shard distinct
    runs travel as (key, count) partials, O(n_local) per device.
    Returns (num_unique, keys_ascending, counts) as host arrays."""
    keys = np.asarray(keys)
    ng, gk, counts = distributed_group_aggregate(
        keys, np.ones(keys.shape[0], np.int32), agg="count", mesh=mesh,
        axis=axis, **kw)
    return ng, gk, counts
