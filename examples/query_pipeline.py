"""End-to-end query pipeline on the TPU-native engine.

A worked example of the operator set composing into the north-star shape:
load -> filter -> sort -> group aggregate -> join -> top-k, all static-shape
and jittable.  Run:

    python examples/query_pipeline.py          # real TPU if available
    JAX_PLATFORMS=cpu python examples/query_pipeline.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import simd_radix_sort_tpu as srs  # noqa: E402
from simd_radix_sort_tpu.ops import filter as f_op  # noqa: E402
from simd_radix_sort_tpu.ops import hashagg, hashjoin, topk  # noqa: E402


def main():
    rng = np.random.default_rng(7)
    n = 1 << 20

    # a fact table: (customer_id, amount) and a dimension table:
    # (customer_id, region)
    cust = rng.integers(0, 5000, n, dtype=np.int32)
    amount = rng.gamma(2.0, 50.0, n).astype(np.float32)
    dim_cust = np.arange(5000, dtype=np.int32)
    dim_region = (dim_cust % 7).astype(np.uint8)

    # 1. filter: only purchases over 100 (amount drives the predicate;
    # customer ids ride along in lock-step)
    count, amt_f, cust_f = f_op.filter_rows(lambda a: a > 100.0,
                                            jnp.asarray(amount),
                                            jnp.asarray(cust))
    k = int(count)
    print(f"filter: {k} of {n} rows pass")

    # 2. group aggregate: total spend per customer (on the valid prefix)
    ng, gk, (sums,) = hashagg.group_aggregate(cust_f[:k], amt_f[:k],
                                              aggs=("sum",))
    g = int(ng)
    print(f"aggregate: {g} customers")

    # 3. join each customer's total with its region
    found, cnts, (regions,) = hashjoin.lookup_join(
        gk[:g], jnp.asarray(dim_cust), (jnp.asarray(dim_region),))
    assert bool(jnp.all(found[:g]))

    # 4. top-10 customers by total spend, with region carried along
    top_s, top_c, top_r = topk.top_k(sums[0][:g], gk[:g], regions[:g], k=10)
    print("top spenders:")
    for s, c, r in zip(np.asarray(top_s), np.asarray(top_c),
                       np.asarray(top_r)):
        print(f"  customer {int(c):5d}  region {int(r)}  total {float(s):10.2f}")

    # 5. full sorted listing (key + payload lock-step)
    c_sorted, a_sorted = srs.sort(cust, amount)
    assert np.all(np.asarray(c_sorted)[:-1] <= np.asarray(c_sorted)[1:])
    print("sorted listing ready:", np.asarray(c_sorted).shape)


if __name__ == "__main__":
    main()
