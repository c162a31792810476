"""Randomized differential fuzz: every registered engine must agree with
the NumPy oracle on random (dtype, distribution, size, direction,
payload) workloads.  Seeds are fixed — failures reproduce exactly."""

import numpy as np
import pytest

import simd_radix_sort_tpu as srs
from simd_radix_sort_tpu import methods
from simd_radix_sort_tpu.utils import data as D

DTYPES = [np.uint8, np.int8, np.uint16, np.int16, np.uint32, np.int32,
          np.uint64, np.int64, np.float32, np.float64]
PAYLOADS = [(), (np.uint32,), (np.uint64, np.uint8), (np.float32,)]


@pytest.mark.parametrize("trial", range(24))
def test_random_workload_all_engines(trial):
    rng = np.random.default_rng(1000 + trial)
    kdt = DTYPES[rng.integers(len(DTYPES))]
    pdts = PAYLOADS[rng.integers(len(PAYLOADS))]
    dist = list(D.Distribution)[rng.integers(len(D.Distribution))]
    n = int(rng.integers(1, 20_000))
    ascending = bool(rng.integers(2))
    keys = D.make_keys(n, kdt, dist, seed=int(rng.integers(1 << 30)))
    pays = D.make_payloads(keys, pdts, "fast")

    for name, m in methods.REGISTRY.items():
        if not m.supports(np.dtype(kdt), tuple(np.dtype(p) for p in pdts),
                          n):
            continue
        out = srs.sort_with_payloads(keys, tuple(pays), method=name,
                                     ascending=ascending)
        err = D.check_data(np.asarray(out[0]),
                           tuple(np.asarray(p) for p in out[1]),
                           keys, ascending)
        assert err == "", (trial, name, kdt, pdts, dist, n, ascending, err)
