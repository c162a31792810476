"""Distributed query pipeline over a jax.sharding.Mesh.

The scale-out companion of examples/query_pipeline.py: a fact table and a
dimension table row-sharded over every device, processed with the mesh
operator set — distributed filter -> distributed join (range-partitioned
ragged exchange) -> distributed aggregate -> distributed sort -> top-k.

Run on the virtual 8-device mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               exec(open('examples/distributed_pipeline.py').read())"

or on real multi-chip hardware simply:  python examples/distributed_pipeline.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from simd_radix_sort_tpu.parallel import dist_ops, dist_sort  # noqa: E402


def main():
    import jax
    jax.config.update("jax_enable_x64", True)  # int64 revenue sums below
    n_dev = len(jax.devices())
    mesh = dist_sort.make_mesh()
    rng = np.random.default_rng(11)
    n = n_dev * (1 << 14)

    # fact table: (customer_id, amount_cents); dimension: (id, region)
    cust = rng.integers(0, 4096, n, dtype=np.int32)
    amount = rng.integers(1, 50_000, n, dtype=np.int32)
    dim_id = np.arange(0, n_dev * 512, dtype=np.int32) % 4096
    dim_region = (dim_id % 7).astype(np.int32)

    # 1. distributed filter: big purchases only
    counts, ck, (ca,) = dist_ops.distributed_filter(
        lambda a: a > 25_000, amount, cust, mesh=mesh)
    amt_f, (cust_f,) = dist_ops.gather_filtered(counts, ck, (ca,))
    print(f"filter: {len(amt_f)} of {n} rows pass on {n_dev} devices")

    # 2. distributed join: attach each purchase's region (tables must be
    # divisible by the mesh size — trim the filtered ragged tail)
    m = len(cust_f) // n_dev * n_dev
    cust_f, amt_f = cust_f[:m], amt_f[:m]
    jc, jk, (ja,), (jr,), ov, jmeta = dist_ops.distributed_join(
        cust_f, (amt_f,), dim_id, (dim_region,), mesh=mesh,
        capacity_factor=4.0, out_rows_per_device=4 * (m + len(dim_id)))
    assert not np.asarray(ov).any()
    k_j, (amt_j,), (reg_j,) = dist_ops.gather_joined(jc, jk, (ja,), (jr,))
    print(f"join: {len(k_j)} matched purchase rows")

    # 3. distributed aggregate: revenue + order count + mean ticket per
    # region, all three in ONE exchange (tuple agg dedupes the partials)
    ngroups, regions, (revenue, orders, mean_amt) = \
        dist_ops.distributed_group_aggregate(
            reg_j[: len(reg_j) // n_dev * n_dev],
            amt_j[: len(amt_j) // n_dev * n_dev].astype(np.int64),
            agg=("sum", "count", "mean"), mesh=mesh)
    for r, v, c, mu in zip(regions, revenue, orders, mean_amt):
        print(f"  region {r}: revenue {int(v)} over {int(c)} orders "
              f"(mean {mu:.0f})")

    # 3b. the same aggregate over a hierarchical (DCN x ICI) mesh: partials
    # cross the slow axis once in an S-way collective (multi-slice path)
    if n_dev % 2 == 0:
        from simd_radix_sort_tpu.parallel import multihost
        m = len(reg_j) // n_dev * n_dev
        hng, hreg, hrev = multihost.hierarchical_group_aggregate(
            reg_j[:m], amt_j[:m].astype(np.int64), agg="sum",
            mesh=multihost.make_hierarchical_mesh(num_slices=2))
        assert hng == ngroups and np.array_equal(hreg, regions)
        assert np.array_equal(hrev, revenue)
        print(f"hierarchical aggregate (2 slices): matches flat "
              f"({hng} regions)")

    # 4. distributed sort of the joined table by amount (descending)
    m = len(amt_j) // n_dev * n_dev
    out_k, out_p, counts_s, ov_s, meta = dist_sort.distributed_sort(
        amt_j[:m], k_j[:m], mesh=mesh, ascending=False)
    assert not np.asarray(ov_s).any()
    top_amt, (top_cust,) = dist_sort.gather_result(out_k, out_p, counts_s,
                                                   meta)
    print(f"sort: top purchase {top_amt[0]} by customer {top_cust[0]}")

    # 5. distributed top-k without the full sort
    top5 = dist_ops.distributed_top_k(amt_j[:m], k_j[:m], k=5, mesh=mesh)
    print("top-5 purchases:", top5[0].tolist())
    assert np.array_equal(np.asarray(top5[0]), np.asarray(top_amt[:5]))
    print("distributed pipeline: OK")


if __name__ == "__main__":
    main()
