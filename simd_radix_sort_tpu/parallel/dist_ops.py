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

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import filter as filter_op
from ..ops import hashagg
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
        ng2, gk2, (res2, res_max) = hashagg.group_aggregate(
            gk_all, tuple(parts_all) + (vstream,),
            aggs=(combine_agg, "max"))
        totals = res2[:-1]
        vres = res_max[-1]  # max of the validity bits per group
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
