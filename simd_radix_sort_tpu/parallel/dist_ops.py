"""Distributed query operators over a jax.sharding.Mesh.

Scale-out of the single-chip operator set (ops/filter, ops/hashagg) — new
scope per the north star (the reference has neither operators nor any
parallelism, SURVEY.md section 2.11).  Same padded static-shape idiom as
parallel/dist_sort: per-device valid counts travel with the data.

  * `distributed_filter` — embarrassingly parallel: each device compacts
    its shard locally; output stays sharded as (packed rows, counts).
  * `distributed_group_aggregate` — two-phase aggregation: per-shard
    group_aggregate, then an all_gather of the (small) per-shard partials
    and a final combine on every device (replicated result).  Combinable
    aggregates only ("sum", "count", "min", "max" — "mean" travels as
    (sum, count) partials in the same exchange).
  * `distributed_top_k` — two-level selection: local top-k, k*P-row
    gather, final top-k (exchange independent of n).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import filter as filter_op
from ..ops import hashagg
from ..ops import hashjoin
from ..utils import transforms
from . import dist_sort
from .dist_sort import DEFAULT_AXIS, make_mesh


def distributed_filter(predicate, keys, *payloads, mesh: Mesh | None = None,
                       axis: str = DEFAULT_AXIS):
    """Filter a row-sharded table.  Returns (counts, keys, payloads...):
    each device's selected rows packed at the front of its shard, with a
    per-device valid count (P,)."""
    if mesh is None:
        mesh = make_mesh()
    sharding = NamedSharding(mesh, P(axis))
    keys_d = jax.device_put(jnp.asarray(np.asarray(keys)), sharding)
    pays_d = tuple(jax.device_put(jnp.asarray(np.asarray(p)), sharding)
                   for p in payloads)

    def local(k, *ps):
        out = filter_op.filter_rows(predicate, k, *ps)
        return (out[0][None],) + tuple(out[1:])

    shard = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis),) * (1 + len(payloads)),
        out_specs=(P(axis),) * (2 + len(payloads)))
    out = jax.jit(shard)(keys_d, *pays_d)
    return out[0], out[1], tuple(out[2:])


def gather_filtered(counts, keys, payloads=()):
    """Host-side: concatenate each device's valid prefix (same padded-
    prefix protocol as the distributed sort's output)."""
    from .dist_sort import gather_result
    return gather_result(keys, tuple(payloads), counts)


def distributed_group_aggregate(keys, values, agg: str = "sum",
                                mesh: Mesh | None = None,
                                axis: str = DEFAULT_AXIS):
    """Aggregate values per distinct key across the whole mesh.

    Returns (num_groups, group_keys, result) replicated on every device,
    padded to the per-shard row count (group count must fit one shard's
    rows, i.e. distinct keys <= n/P — the standard partial-aggregate
    regime).  agg in {"sum", "count", "min", "max", "mean"}."""
    if agg not in ("sum", "count", "min", "max", "mean"):
        raise ValueError(f"unsupported distributed aggregate {agg!r}")
    if mesh is None:
        mesh = make_mesh()
    num_p = mesh.shape[axis]
    sharding = NamedSharding(mesh, P(axis))
    keys_d = jax.device_put(jnp.asarray(np.asarray(keys)), sharding)
    vals_d = jax.device_put(jnp.asarray(np.asarray(values)), sharding)

    # phase-1 partial aggregates per shard; phase-2 combine over gathered
    # partials.  mean decomposes into (sum, count) partials combined by sum
    # in the SAME exchange — one sort per phase regardless of agg.
    partial_aggs = {"sum": ("sum",), "count": ("count",), "min": ("min",),
                    "max": ("max",), "mean": ("sum", "count")}[agg]
    combine_agg = "sum" if agg in ("sum", "count", "mean") else agg

    def _identity(dtype):
        if np.dtype(dtype).kind in "iu":
            info = np.iinfo(dtype)
            return dtype.type(info.max if combine_agg == "min" else info.min)
        return dtype.type(np.inf if combine_agg == "min" else -np.inf)

    def local(k, v):
        ng, gk, results = hashagg.group_aggregate(k, v, aggs=partial_aggs)
        parts = [res if pa == "count" else res[0]
                 for pa, res in zip(partial_aggs, results)]
        n_l = k.shape[0]
        valid = jnp.arange(n_l, dtype=jnp.int32) < ng

        gk_all = jax.lax.all_gather(gk, axis).reshape(-1)
        valid_all = jax.lax.all_gather(valid, axis).reshape(-1)
        parts_all = [jax.lax.all_gather(p, axis).reshape(-1) for p in parts]
        # invalid (padding) rows must not perturb any group they collide
        # with: zero contribution under sum, the combine's identity element
        # under min/max.  Validity travels as its OWN stream with its own
        # max-combine (a group is real iff ANY contributor was valid) — no
        # in-band sentinel values to decode.
        if combine_agg == "sum":
            parts_all = [jnp.where(valid_all, p, 0) for p in parts_all]
        else:
            parts_all = [jnp.where(valid_all, p, _identity(p.dtype))
                         for p in parts_all]
        vstream = valid_all.astype(jnp.int32)
        # combine the data partials with combine_agg, the validity stream
        # with its own max — each scan only runs on the stream it serves
        ng2, gk2, (res2, res_max) = hashagg.group_aggregate(
            gk_all, tuple(parts_all) + (vstream,),
            aggs=(combine_agg, "max"),
            agg_streams=(tuple(range(len(parts_all))), (len(parts_all),)))
        totals = res2
        vres = res_max[0]  # max of the validity bits per group
        rows = jnp.arange(gk_all.shape[0], dtype=jnp.int32)
        real = (vres == 1) & (rows < ng2)
        cnt, gk_f, *tot_f = filter_op.compact(real, gk2, *totals)
        return ((cnt[None], gk_f[: n_l])
                + tuple(t[: n_l] for t in tot_f))

    shard = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=(P(axis),) * (2 + len(partial_aggs)))
    out = jax.jit(shard)(keys_d, vals_d)
    counts, gks, totals = out[0], out[1], out[2:]
    # every device computed the same replicated answer; take device 0's
    n_shard = np.asarray(gks).shape[0] // num_p
    ng = int(np.asarray(counts)[0])
    if ng > n_shard:
        raise ValueError(
            f"{ng} distinct keys exceed the per-shard capacity {n_shard}; "
            "distributed_group_aggregate requires distinct keys <= n/P")
    gk_out = np.asarray(gks)[:n_shard][:ng]
    tot = [np.asarray(t)[:n_shard][:ng] for t in totals]
    if agg == "mean":
        s, c = tot
        return ng, gk_out, s / c.astype(np.float64)
    return ng, gk_out, tot[0]


def distributed_join(probe_keys, probe_payloads, build_keys, build_payloads,
                     mesh: Mesh | None = None, axis: str = DEFAULT_AXIS,
                     capacity_factor: float = 2.0,
                     out_rows_per_device: int | None = None,
                     samples_per_device: int = 128,
                     use_ragged: bool | None = None):
    """Mesh inner join: range-partition BOTH tables by shared splitters,
    ragged-exchange each side over ICI, sort-merge join locally.

    The splitter domain is the key alone (no position tie-break, unlike
    the distributed sort): equal keys MUST co-locate on one device so
    every match pair meets.  Splitters are sampled from both tables, so a
    key range that is heavy on either side gets boundaries.  This is the
    natural mesh join given the splitter sort already range-partitions
    keys (round-1 VERDICT item 1 / SURVEY.md section 7 step 5 scaled out).

    Returns (counts, out_keys, out_probe_payloads, out_build_payloads,
    overflow): per-device padded outputs — device p holds matches for the
    p-th key range, `counts[p]` valid rows each, packed at the front.
    overflow flags either a receive-buffer or an output-capacity overrun
    (rerun with a larger factor / out_rows_per_device).  Keys of both
    tables must share one dtype.
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

        # local sort each side by key (buckets become contiguous runs)
        sp = jax.lax.sort(tuple(kops_p) + tuple(pp_ops), num_keys=nk)
        sb = jax.lax.sort(tuple(kops_b) + tuple(bp_ops), num_keys=nk)
        dom_p, pp_s = sp[:nk], sp[nk:]
        dom_b, bp_s = sb[:nk], sb[nk:]

        # shared splitters from BOTH tables' samples (key domain only:
        # equal keys co-locate)
        dom_cat = tuple(jnp.concatenate([a, b])
                        for a, b in zip(dom_p, dom_b))
        splitters = dist_sort.gather_splitters(dom_cat, axis, num_p - 1,
                                               samples_per_device)

        recv_p, tot_p, ov_p = dist_sort.exchange_by_bounds(
            tuple(dom_p) + tuple(pp_s),
            dist_sort.lex_bounds(dom_p, splitters), axis, cap_p, use_ragged)
        recv_b, tot_b, ov_b = dist_sort.exchange_by_bounds(
            tuple(dom_b) + tuple(bp_s),
            dist_sort.lex_bounds(dom_b, splitters), axis, cap_b, use_ragged)

        total, pidx, bidx = hashjoin.merge_join_indices(
            tuple(recv_p[:nk]), tot_p, tuple(recv_b[:nk]), tot_b, cap_out)
        count = jnp.minimum(total, cap_out).astype(jnp.int32)
        valid = jnp.arange(cap_out, dtype=jnp.int32) < count
        ov = (ov_p + ov_b
              + jax.lax.pmax((total > cap_out).astype(jnp.int32), axis))

        out_kops = tuple(jnp.where(valid, jnp.take(w, pidx), 0)
                         for w in recv_p[:nk])
        keys_out = transforms.keys_from_operands(
            out_kops, key_f64 or pk_l.dtype, True,
            as_bits=key_f64 is not None)
        out_pp = tuple(jnp.where(valid, jnp.take(s, pidx), 0)
                       for s in recv_p[nk:])
        out_bp = tuple(jnp.where(valid, jnp.take(s, bidx), 0)
                       for s in recv_b[nk:])
        out_pp = dist_sort.merge_payload_streams(out_pp, p_dts)
        out_bp = dist_sort.merge_payload_streams(out_bp, b_dts)
        return (count[None], keys_out) + out_pp + out_bp + (ov[None],)

    n_out = 2 + len(p_dts) + len(b_dts) + 1
    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),) * (2 + len(p_dts) + len(b_dts)),
        out_specs=(P(axis),) * n_out)
    out = jax.jit(shard)(pk, bk, *pp, *bp)
    counts, keys_out = out[0], out[1]
    out_pp = tuple(out[2: 2 + len(p_dts)])
    out_bp = tuple(out[2 + len(p_dts): 2 + len(p_dts) + len(b_dts)])
    overflow = out[-1]
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
    sharding = NamedSharding(mesh, P(axis))
    keys_d = jax.device_put(jnp.asarray(np.asarray(keys)), sharding)
    pays_d = tuple(jax.device_put(jnp.asarray(np.asarray(p)), sharding)
                   for p in payloads)

    def local(kk, *ps):
        loc = topk.top_k(kk, *ps, k=min(k, kk.shape[0]), largest=largest)
        gathered = [jax.lax.all_gather(s, axis).reshape(-1) for s in loc]
        fin = topk.top_k(gathered[0], *gathered[1:], k=k, largest=largest)
        return tuple(f[None] for f in fin)  # replicated -> per-device row

    shard = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis),) * (1 + len(payloads)),
        out_specs=(P(axis),) * (1 + len(payloads)))
    out = jax.jit(shard)(keys_d, *pays_d)
    # all devices hold identical answers; take the first device's row
    return tuple(np.asarray(o)[0] for o in out)
