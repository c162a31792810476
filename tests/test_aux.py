"""Auxiliary subsystems: profiling report + multihost mesh helpers."""

import numpy as np
import jax
import jax.numpy as jnp

import simd_radix_sort_tpu as srs
from simd_radix_sort_tpu.utils import profiling
from simd_radix_sort_tpu.parallel import multihost, dist_sort


def test_profiling_measure_report():
    keys = np.random.default_rng(0).integers(0, 2**32, 100_000,
                                             dtype=np.uint32)
    fn = jax.jit(lambda k: srs.sort(k, method="xla"))
    rep = profiling.measure(fn, jnp.asarray(keys), name="u32-sort",
                            row_bytes=4, key_bits=32)
    assert rep.rows == 100_000
    assert rep.rows_per_s > 0 and rep.roofline_frac >= 0
    assert "u32-sort" in rep.line()


def test_multihost_mesh_single_process():
    mesh = multihost.make_hierarchical_mesh()
    assert mesh.shape["slice"] == 1
    assert mesh.shape["x"] == len(jax.devices())


def test_multihost_sort_flattened():
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 2**32, 8 * 512, dtype=np.uint32)
    out_k, out_p, counts, overflow, meta = multihost.distributed_sort_multihost(
        keys)
    got, _ = dist_sort.gather_result(out_k, out_p, counts, meta)
    assert not bool(np.asarray(overflow).any())
    assert np.array_equal(got, np.sort(keys))
