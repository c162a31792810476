"""Pallas counting-sort kernels (ops/pallas_hist.py) in interpreter mode.

The real-TPU path is exercised by bench.py's correctness gate and the
perf suite; here the same kernels run under the Pallas interpreter on the
CPU mesh so the suite stays hermetic (SURVEY.md section 5 race-detection
analogue: interpret-mode runs replace sanitizers)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simd_radix_sort_tpu.ops import pallas_hist


def test_histogram_interpret_matches_bincount():
    rng = np.random.default_rng(0)
    n = pallas_hist.HIST_BLOCK_ROWS * 128 * 2 + 1  # 2 full blocks + pad
    v = rng.integers(0, 256, n, dtype=np.int64).astype(np.int32)
    hist = jax.jit(
        lambda x: pallas_hist.histogram(x, 256, interpret=True))(jnp.asarray(v))
    assert np.array_equal(np.asarray(hist), np.bincount(v, minlength=256))


def test_histogram_ignores_out_of_range():
    v = np.array([0, 5, 5, 300, -1, 7], dtype=np.int32)
    hist = np.asarray(pallas_hist.histogram(jnp.asarray(v), 8, interpret=True))
    want = np.zeros(8, np.int32)
    want[0], want[5], want[7] = 1, 2, 1
    assert np.array_equal(hist, want)


@pytest.mark.parametrize("n_extra", [0, 1, 127, 12345])
def test_fill_runs_interpret(n_extra):
    rng = np.random.default_rng(1)
    n = pallas_hist.FILL_BLOCK + n_extra
    v = rng.integers(0, 64, n).astype(np.int32)
    hist = jnp.asarray(np.bincount(v, minlength=64).astype(np.int32))
    out = jax.jit(lambda h: pallas_hist.fill_runs(h, n, 10, jnp.int32,
                                                  interpret=True))(hist)
    assert np.array_equal(np.asarray(out), np.sort(v) + 10)


def test_fill_runs_skewed_many_transitions_per_block():
    # every bucket tiny -> many run boundaries inside one output block
    k = 512
    hist = jnp.asarray(np.full(k, 3, np.int32))
    n = 3 * k
    out = np.asarray(pallas_hist.fill_runs(hist, n, 0, jnp.int32,
                                           interpret=True))
    assert np.array_equal(out, np.repeat(np.arange(k), 3))


def test_fill_runs_empty_buckets():
    hist = jnp.asarray(np.array([0, 5, 0, 0, 2, 0], np.int32))
    out = np.asarray(pallas_hist.fill_runs(hist, 7, 0, jnp.uint8,
                                           interpret=True))
    assert np.array_equal(out, np.array([1] * 5 + [4] * 2, np.uint8))
