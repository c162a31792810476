"""Multi-host / multi-slice (DCN) scale-out: hierarchical two-phase sort
and the matching two-tier group aggregate.

The reference is single-process by construction (SURVEY.md section 2.11);
this module is the DCN tier of the north star's scale-out plan (SURVEY.md
section 7 step 6): a mesh whose OUTER axis crosses slices over DCN and
whose INNER axis rides ICI within a slice, and a sort whose row exchange
crosses the slow axis exactly once:

  phase 1 (DCN, chunked):  S-1 coarse splitters from a global sample
      assign every row to a destination SLICE; each device ragged-
      exchanges bucket s to its same-position peer in slice s over the
      `slice` axis only.  The local shard is processed in Q independent
      chunks — chunk q's local sort has no data dependence on chunk
      q-1's collective, so XLA's async scheduler overlaps DCN transfer
      with local compute (software double-buffering expressed as
      dataflow independence, the collective-pipelining idiom).
  phase 2 (ICI):  within each slice, the standard splitter sort of
      parallel/dist_sort runs over the inner axis — collectives named on
      the inner axis operate per-slice subgroups automatically.

Every row therefore crosses DCN at most once, and the fine-grained
(P-way) partitioning traffic stays on ICI — the hierarchical schedule the
flat single-axis sort lacks.  Single-host virtual testing:
`XLA_FLAGS=--xla_force_host_platform_device_count=N` with backend cpu
exercises the identical program structure (tests/test_multihost.py).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import hashagg
from ..utils import transforms
from . import dist_ops
from . import dist_sort


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op when already initialized or when
    running single-process).  On Cloud TPU pods the arguments are inferred
    from the environment; elsewhere pass them explicitly."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_hierarchical_mesh(ici_axis: str = "x", dcn_axis: str = "slice",
                           num_slices: int | None = None) -> Mesh:
    """Mesh with slices/hosts on the outer (DCN) axis and each slice's
    chips on the inner (ICI) axis.

    Devices are grouped EXPLICITLY by process index (jax.devices() order
    is not guaranteed process-contiguous); a ragged grouping raises
    instead of silently degrading to a 1xN mesh.  `num_slices` overrides
    the process count for single-process virtual testing."""
    devs = jax.devices()
    if num_slices is None:
        num_slices = max(jax.process_count(), 1)
        if num_slices > 1:
            by_proc = {}
            for d in devs:
                by_proc.setdefault(d.process_index, []).append(d)
            sizes = {len(v) for v in by_proc.values()}
            if len(sizes) != 1:
                raise ValueError(
                    f"uneven devices per process: "
                    f"{ {k: len(v) for k, v in by_proc.items()} }")
            grid = np.array([by_proc[k] for k in sorted(by_proc)])
            return Mesh(grid, (dcn_axis, ici_axis))
    if len(devs) % num_slices:
        raise ValueError(f"{len(devs)} devices not divisible into "
                         f"{num_slices} slices")
    grid = np.array(devs).reshape(num_slices, -1)
    return Mesh(grid, (dcn_axis, ici_axis))


def hierarchical_sort_sharded(keys, payloads, mesh: Mesh,
                              ici_axis: str = "x", dcn_axis: str = "slice",
                              ascending: bool = True,
                              capacity_factor: float = 2.0,
                              samples_per_device: int = 128,
                              exchange_chunks: int = 2,
                              key_dtype=None,
                              use_ragged: bool | None = None):
    """Jittable two-phase sort over a (dcn, ici) mesh.

    keys/payloads are row-sharded over BOTH axes (slice-major).  Returns
    (padded_keys, padded_payloads, counts, overflow) like
    distributed_sort_sharded; concatenating valid prefixes in mesh order
    (slice-major, then chip) is the globally sorted table.
    """
    num_s = mesh.shape[dcn_axis]
    num_c = mesh.shape[ici_axis]
    num_p = num_s * num_c
    n = keys.shape[0]
    if n % num_p:
        raise ValueError(f"global length {n} not divisible by {num_p}")
    n_local = n // num_p
    q = max(1, min(exchange_chunks, n_local))
    while n_local % q:
        q -= 1
    chunk = n_local // q
    cap1 = max(int(math.ceil(capacity_factor * chunk)), 1)
    cap2 = max(int(math.ceil(capacity_factor * n_local)), 1)
    use_ragged = dist_sort.default_use_ragged(use_ragged)

    kdt = np.dtype(key_dtype) if key_dtype is not None else np.dtype(keys.dtype)
    pl_dtypes = [np.dtype(p.dtype) for p in payloads]

    def _domain(kops_s, n_rows, pos_base, stride):
        """Sample/search domain with a device-interleaved position
        tie-break (same balance trick as dist_sort): (key words..., pos)
        pure-u32 lexicographic — no 64-bit lanes (a packed-u64 variant
        silently truncates when x64 is off)."""
        if n_rows * stride >= 2**32:
            raise ValueError(
                f"global rows {n_rows * stride} >= 2^32: the u32 "
                "interleaved tie-break would wrap (see dist_sort)")
        pos = (jnp.arange(n_rows, dtype=jnp.uint32) * jnp.uint32(stride)
               + pos_base.astype(jnp.uint32))
        return tuple(kops_s) + (pos,)

    def local_fn(keys_l, *payloads_l):
        s_idx = jax.lax.axis_index(dcn_axis)
        c_idx = jax.lax.axis_index(ici_axis)
        dev = s_idx * num_c + c_idx
        kops = transforms.key_operands(keys_l, ascending, key_dtype)
        nk = len(kops)
        pl_ops = dist_sort.split_payload_streams(payloads_l, pl_dtypes)
        streams = tuple(kops) + tuple(pl_ops)

        # ---- phase 1: coarse partition across slices over DCN ----------
        # sort the Q chunks independently (their sorts and collectives
        # have no mutual data dependence -> the scheduler can overlap
        # chunk q+1's local sort with chunk q's DCN transfer)
        parts_sorted = []
        domains = []
        for i in range(q):
            part = tuple(w[i * chunk:(i + 1) * chunk] for w in streams)
            ps = jax.lax.sort(part, num_keys=nk, is_stable=False)
            parts_sorted.append(ps)
            domains.append(_domain(ps[:nk], chunk,
                                   dev * jnp.uint32(q) + jnp.uint32(i),
                                   num_p * q))
        # slice splitters from a GLOBAL sample (gathered over both axes so
        # every device agrees on the slice key ranges)
        dom_cat = tuple(jnp.concatenate([d[j] for d in domains])
                        for j in range(len(domains[0])))
        spl_s = dist_sort.gather_splitters(
            dom_cat, (dcn_axis, ici_axis), num_s - 1,
            samples_per_device) if num_s > 1 else None

        recv_chunks = []
        totals = []
        ov1 = jnp.int32(0)
        for i in range(q):
            if num_s > 1:
                bounds = dist_sort.lex_bounds(domains[i], spl_s)
                recv, tot, ov = dist_sort.exchange_by_bounds(
                    parts_sorted[i], bounds, dcn_axis, cap1, use_ragged)
                ov1 = ov1 + ov
            else:
                recv, tot = list(parts_sorted[i]), jnp.int32(chunk)
            recv_chunks.append(recv)
            totals.append(tot)

        # merge the chunk buffers; invalid rows flagged and collected last
        merged = [jnp.concatenate([rc[j] for rc in recv_chunks])
                  for j in range(len(streams))]
        valid_parts = [jnp.arange(rc[0].shape[0], dtype=jnp.int32) < t
                       for rc, t in zip(recv_chunks, totals)]
        invalid = (~jnp.concatenate(valid_parts)).astype(jnp.uint8)
        n1 = merged[0].shape[0]
        total1 = functools.reduce(jnp.add, totals).astype(jnp.int32)

        # ---- phase 2: fine splitter sort within the slice over ICI -----
        sorted2 = jax.lax.sort((invalid,) + tuple(merged),
                               num_keys=1 + nk, is_stable=False)
        inv2 = sorted2[0]
        kops2 = sorted2[1:1 + nk]
        rest2 = sorted2[1 + nk:]
        # domain over valid rows; invalid rows get all-ones words so they
        # fall past every splitter and are clipped off by n_valid
        dom2 = _domain(kops2, n1, dev, num_p)
        dom2 = tuple(jnp.where(inv2 == 0, w, ~w.dtype.type(0))
                     for w in dom2)
        spl_c = dist_sort.gather_splitters(dom2, ici_axis, num_c - 1,
                                           samples_per_device,
                                           n_valid=total1) \
            if num_c > 1 else None
        if num_c > 1:
            bounds2 = dist_sort.lex_bounds(dom2, spl_c)
            recv2, total2, ov2 = dist_sort.exchange_by_bounds(
                (inv2,) + tuple(kops2) + tuple(rest2), bounds2, ici_axis,
                cap2, use_ragged, n_valid=total1)
            inv_r = recv2[0]
            kops_r = recv2[1:1 + nk]
            rest_r = recv2[1 + nk:]
            pad2 = (jnp.arange(cap2, dtype=jnp.int32) >= total2)
            invalid2 = jnp.maximum(inv_r, pad2.astype(jnp.uint8))
        else:
            kops_r, rest_r = kops2, rest2
            invalid2, total2, ov2 = inv2, total1, jnp.int32(0)

        fin = jax.lax.sort((invalid2,) + tuple(kops_r) + tuple(rest_r),
                           num_keys=1 + nk, is_stable=False)
        kops_f = fin[1:1 + nk]
        pays_f = fin[1 + nk:]
        count = jnp.sum((fin[0] == 0).astype(jnp.int32))

        keys_out = transforms.keys_from_operands(
            tuple(kops_f), kdt, ascending, as_bits=key_dtype is not None)
        overflow = jax.lax.pmax(jax.lax.pmax(
            (ov1 + ov2), ici_axis), dcn_axis)
        return (keys_out, dist_sort.merge_payload_streams(pays_f, pl_dtypes),
                count[None], overflow[None])

    spec = P((dcn_axis, ici_axis))
    shard = functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec,) * (1 + len(payloads)),
        out_specs=(spec, tuple(spec for _ in payloads), spec, spec),
    )
    return shard(local_fn)(keys, *payloads)


def hierarchical_sort(keys, *payloads, mesh: Mesh | None = None,
                      ici_axis: str = "x", dcn_axis: str = "slice",
                      num_slices: int | None = None, **kw):
    """Host-friendly entry for the two-phase sort: shards host arrays over
    a (slice, chip) mesh, runs one jitted step, returns
    (padded_keys, payloads, counts, overflow, meta) like
    dist_sort.distributed_sort (gather with dist_sort.gather_result)."""
    if mesh is None:
        mesh = make_hierarchical_mesh(ici_axis, dcn_axis, num_slices)
    keys, key_dtype = dist_sort.stage_host_bits(keys)
    pl = [dist_sort.stage_host_bits(p) for p in payloads]
    payloads = tuple(p for p, _ in pl)
    meta = {"key_dtype": key_dtype, "payload_dtypes": [dt for _, dt in pl]}

    sharding = NamedSharding(mesh, P((dcn_axis, ici_axis)))
    keys_d = jax.device_put(jnp.asarray(keys), sharding)
    pays_d = tuple(jax.device_put(jnp.asarray(p), sharding) for p in payloads)
    fn = dist_sort.cached_jit(
        ("hierarchical", mesh, ici_axis, dcn_axis, str(key_dtype),
         keys.shape, keys.dtype.str,
         tuple((p.shape, p.dtype.str) for p in payloads),
         tuple(sorted(kw.items()))),
        lambda: functools.partial(
            hierarchical_sort_sharded, mesh=mesh, ici_axis=ici_axis,
            dcn_axis=dcn_axis, key_dtype=key_dtype, **kw))
    out_keys, out_pays, counts, overflow = fn(keys_d, pays_d)
    return out_keys, out_pays, counts, overflow, meta


def hierarchical_group_aggregate_sharded(keys, values, mesh: Mesh,
                                         aggs_req, ici_axis: str = "x",
                                         dcn_axis: str = "slice",
                                         capacity_factor: float = 2.0,
                                         cap1: int | None = None,
                                         cap2: int | None = None,
                                         samples_per_device: int = 128,
                                         key_dtype=None,
                                         use_ragged: bool | None = None):
    """Jittable two-tier group aggregate over a (dcn, ici) mesh.

    The DCN-aware schedule of `hierarchical_sort_sharded` applied to
    aggregate PARTIALS (dist_ops partial-stream algebra):

      1. local sorted-prefix group_aggregate — after this each device
         contributes at most ONE partial row per key, so a hot key's
         total volume anywhere is bounded by the device count (aggregates
         need no skew tie-break);
      2. coarse key-range splitters from a global sample route each
         partial to its owner SLICE over the `slice` axis only (every
         partial crosses DCN at most once, in one S-way collective);
      3. arriving partials combine per chip (also re-sorting the valid
         prefix for the next exchange's contiguous-range bounds);
      4. fine splitters within the slice route combined partials to
         their owner CHIP over ICI; a final combine finishes.

    Returns (count, group_keys, partial_totals..., overflow) per device;
    concatenating valid prefixes in mesh order (slice-major, then chip)
    is the globally ascending group table.
    """
    num_s = mesh.shape[dcn_axis]
    num_c = mesh.shape[ici_axis]
    n_local = keys.shape[0] // (num_s * num_c)
    # derive receive capacities like hierarchical_sort_sharded does —
    # explicit cap1/cap2 (the host entry's elastic retry) override
    if cap1 is None:
        cap1 = max(int(math.ceil(capacity_factor * n_local)), 1)
    if cap2 is None:
        cap2 = max(int(math.ceil(capacity_factor * n_local)), 1)
    partial_aggs = dist_ops.partial_streams_for(aggs_req)
    use_ragged = dist_sort.default_use_ragged(use_ragged)
    kdt = np.dtype(key_dtype) if key_dtype is not None \
        else np.dtype(keys.dtype)

    def local(k, v):
        kw = transforms.key_operands(k, True, logical_dtype=key_dtype)
        nk = len(kw)
        carrier = transforms.merge64(*kw) if nk == 2 else kw[0]
        cmax = carrier.dtype.type(~np.uint64(0) if nk == 2
                                  else ~np.uint32(0))

        def force_tail(gkc, n_rows, cnt):
            # junk rows past the valid prefix must sort past every
            # splitter (see dist_ops.distributed_group_aggregate)
            valid = jnp.arange(n_rows, dtype=jnp.int32) < cnt
            gkc = jnp.where(valid, gkc, cmax)
            return transforms.split64(gkc) if nk == 2 else (gkc,)

        # ---- tier 0: local partials (one row per key per device) ------
        ng, gkc, results = hashagg.group_aggregate(carrier, v,
                                                   aggs=partial_aggs)
        parts = [res if pa == "count" else res[0]
                 for pa, res in zip(partial_aggs, results)]
        part_dts = [np.dtype(p.dtype) for p in parts]
        kops = force_tail(gkc, k.shape[0], ng)

        # ---- tier 1: DCN — route partials to their owner slice --------
        if num_s > 1:
            spl_s = dist_sort.gather_splitters(
                kops, (dcn_axis, ici_axis), num_s - 1, samples_per_device,
                n_valid=ng)
            part_ops = dist_sort.split_payload_streams(parts, part_dts)
            recv1, tot1, ov1 = dist_sort.exchange_by_bounds(
                kops + tuple(part_ops), dist_sort.lex_bounds(kops, spl_s),
                dcn_axis, cap1, use_ragged, n_valid=ng)
            cnt1, gk1, parts1 = dist_ops.combine_received_partials(
                recv1, nk, part_dts, partial_aggs, tot1, cap1)
            c1 = cap1
            kops1 = force_tail(gk1, c1, cnt1)
        else:
            # one slice: tier 0 already grouped, deduped, and sorted this
            # device's partials — feed them to tier 2 directly instead of
            # paying a redundant combine pass
            cnt1, gk1, parts1 = ng, gkc, parts
            ov1, c1, kops1 = jnp.int32(0), k.shape[0], kops

        # ---- tier 2: ICI — route combined partials to their owner chip
        if num_c > 1:
            spl_c = dist_sort.gather_splitters(
                kops1, ici_axis, num_c - 1, samples_per_device,
                n_valid=cnt1)
            part_ops1 = dist_sort.split_payload_streams(parts1, part_dts)
            recv2, tot2, ov2 = dist_sort.exchange_by_bounds(
                kops1 + tuple(part_ops1),
                dist_sort.lex_bounds(kops1, spl_c),
                ici_axis, cap2, use_ragged, n_valid=cnt1)
            cnt, gk_fc, tot_f = dist_ops.combine_received_partials(
                recv2, nk, part_dts, partial_aggs, tot2, cap2)
        else:
            cnt, gk_fc, tot_f = cnt1, gk1, parts1
            ov2 = jnp.int32(0)

        wf = transforms.split64(gk_fc) if nk == 2 else (gk_fc,)
        gk_f = transforms.keys_from_operands(
            tuple(wf), kdt, True, as_bits=key_dtype is not None)
        overflow = jax.lax.pmax(jax.lax.pmax(ov1 + ov2, ici_axis), dcn_axis)
        return (cnt[None], gk_f) + tuple(tot_f) + (overflow[None],)

    spec = P((dcn_axis, ici_axis))
    shard = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec),
                          out_specs=(spec,) * (3 + len(partial_aggs)))
    return shard(keys, values)


def hierarchical_group_aggregate(keys, values, agg="sum",
                                 mesh: Mesh | None = None,
                                 ici_axis: str = "x",
                                 dcn_axis: str = "slice",
                                 num_slices: int | None = None,
                                 capacity_factor: float = 2.0,
                                 samples_per_device: int = 128,
                                 max_retries: int = 2,
                                 use_ragged: bool | None = None):
    """Host entry for the two-tier (DCN x ICI) group aggregate.

    Same contract as dist_ops.distributed_group_aggregate (agg is a name
    or a tuple of names sharing one set of exchanges; returns
    (num_groups, group_keys, result_or_tuple) as host arrays, group keys
    globally ascending) — but the partial exchange is hierarchical:
    every partial crosses DCN at most once in an S-way collective, and
    the fine-grained partitioning traffic stays on ICI.
    """
    aggs_req, keys, key_f64, values = dist_ops.stage_aggregate_inputs(
        keys, values, agg, "hierarchical_group_aggregate")
    if mesh is None:
        mesh = make_hierarchical_mesh(ici_axis, dcn_axis, num_slices)
    num_p = mesh.shape[dcn_axis] * mesh.shape[ici_axis]
    if keys.shape[0] % num_p:
        raise ValueError(f"global length {keys.shape[0]} not divisible "
                         f"by mesh size {num_p}")
    n_local = keys.shape[0] // num_p
    sharding = NamedSharding(mesh, P((dcn_axis, ici_axis)))
    keys_d = jax.device_put(jnp.asarray(keys), sharding)
    vals_d = jax.device_put(jnp.asarray(values), sharding)
    partial_aggs = dist_ops.partial_streams_for(aggs_req)

    def make_fn(cap_recv):
        return dist_sort.cached_jit(
            ("hier_aggregate", mesh, ici_axis, dcn_axis, aggs_req, cap_recv,
             samples_per_device, use_ragged, str(key_f64), keys.shape,
             keys.dtype.str, values.dtype.str),
            lambda: functools.partial(
                hierarchical_group_aggregate_sharded, mesh=mesh,
                aggs_req=aggs_req, ici_axis=ici_axis, dcn_axis=dcn_axis,
                cap1=cap_recv, cap2=cap_recv,
                samples_per_device=samples_per_device, key_dtype=key_f64,
                use_ragged=use_ragged))

    out = dist_ops.run_elastic_aggregate(
        make_fn, keys_d, vals_d, n_local, num_p, capacity_factor,
        max_retries, "hierarchical_group_aggregate")
    return dist_ops.assemble_aggregate_result(out, agg, aggs_req,
                                              partial_aggs, key_f64)


def distributed_sort_multihost(keys, *payloads, ici_axis: str = "x",
                               dcn_axis: str = "slice", **kw):
    """Back-compat flat entry: sort across all processes' devices over one
    flattened axis (single-phase).  Prefer `hierarchical_sort` on
    multi-slice topologies — it bounds DCN traffic to one pass."""
    mesh2 = make_hierarchical_mesh(ici_axis, dcn_axis)
    flat = Mesh(mesh2.devices.reshape(-1), (ici_axis,))
    return dist_sort.distributed_sort(keys, *payloads, mesh=flat,
                                      axis=ici_axis, **kw)
