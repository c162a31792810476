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


@pytest.mark.parametrize("lo,width", [(0, 16), (7, 16), (2**31 - 5, 16),
                                      (2**32 - 16, 16), (123456, 1),
                                      (0, 1)])
def test_minmax_hist16_interpret(lo, width):
    """Fused (min, max, residue histogram) == separate NumPy passes, and the
    rotation recovers the true histogram for any sub-16 window — including
    windows straddling the sign bit and the u32 wrap boundary."""
    rng = np.random.default_rng(3)
    n = pallas_hist.HIST_BLOCK_ROWS * 128 + 777  # 1 full block + ragged pad
    v = (np.uint32(lo) + rng.integers(0, width, n).astype(np.uint32))
    mn, mx, hist_mod = jax.jit(
        lambda x: pallas_hist.minmax_hist16(x, interpret=True))(jnp.asarray(v))
    assert int(mn) == int(v.min()) and int(mx) == int(v.max())
    want_mod = np.bincount((v & 15).astype(np.int64), minlength=16)
    assert np.array_equal(np.asarray(hist_mod), want_mod)
    # rotation: hist[j] = #{v == min + j}
    rot = (int(v.min()) + np.arange(16, dtype=np.uint64)) & 15
    hist = np.asarray(hist_mod)[rot.astype(np.int64)]
    want = np.array([(v == np.uint32(int(v.min()) + j)).sum()
                     for j in range(16)])
    assert np.array_equal(hist, want)


def test_minmax_hist16_small_and_empty():
    for n in (1, 5, 130):
        v = np.arange(n, dtype=np.uint32) % 3 + 10
        mn, mx, hm = pallas_hist.minmax_hist16(jnp.asarray(v),
                                               interpret=True)
        assert int(mn) == int(v.min()) and int(mx) == int(v.max())
        assert int(np.asarray(hm).sum()) == n


@pytest.mark.parametrize("lo,width,n_extra", [
    (0, 16, 777), (7, 13, 0), (2**31 - 5, 16, 1), (2**32 - 16, 16, 12345),
    (42, 1, 130), (0, 1, 0)])
def test_tiny_sort16_interpret(lo, width, n_extra):
    """One-launch tiny-range sort == np.sort, min/max exact — including
    windows straddling the sign bit and the u32 wrap boundary, constant
    inputs, and ragged tails."""
    rng = np.random.default_rng(5)
    n = pallas_hist.TINY_BLOCK_ROWS * 128 + n_extra
    v = (np.uint32(lo) + rng.integers(0, width, n).astype(np.uint32))
    out, mn, mx = jax.jit(
        lambda x: pallas_hist.tiny_sort16(x, interpret=True))(jnp.asarray(v))
    assert int(mn) == int(v.min()) and int(mx) == int(v.max())
    assert np.array_equal(np.asarray(out), np.sort(v))


def test_tiny_sort16_multiblock_interpret():
    """Several input blocks -> several paint blocks in one grid."""
    rng = np.random.default_rng(6)
    n = pallas_hist.TINY_BLOCK_ROWS * 128 * 3 + 999
    v = rng.integers(100, 100 + 16, n).astype(np.uint32)
    out, mn, mx = pallas_hist.tiny_sort16(jnp.asarray(v), interpret=True)
    assert np.array_equal(np.asarray(out), np.sort(v))
    assert (int(mn), int(mx)) == (int(v.min()), int(v.max()))


def test_tiny_sort16_wide_range_stats_still_exact():
    """Out-of-contract (range >= 16) inputs: the sorted output is garbage
    by contract, but min/max — which gate the caller's cond — are exact."""
    rng = np.random.default_rng(7)
    v = rng.integers(0, 2**32, 4096, dtype=np.uint64).astype(np.uint32)
    _, mn, mx = pallas_hist.tiny_sort16(jnp.asarray(v), interpret=True)
    assert (int(mn), int(mx)) == (int(v.min()), int(v.max()))
