"""Autotune: measured method selection with a persistent cache."""

import numpy as np

import simd_radix_sort_tpu as srs
from simd_radix_sort_tpu import autotune


def test_pick_method_and_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(autotune, "_CACHE_PATH",
                        str(tmp_path / "cache.json"))
    monkeypatch.setattr(autotune, "_cache", None)
    m = autotune.pick_method(np.uint32, (), n=4096, reps=1)
    assert m in autotune._CANDIDATES
    # second call hits the cache (and the file persisted)
    m2 = autotune.pick_method(np.uint32, (), n=4096, reps=1)
    assert m2 == m
    import json
    assert json.load(open(tmp_path / "cache.json"))


def test_sort_with_autotune_method(tmp_path, monkeypatch):
    monkeypatch.setattr(autotune, "_CACHE_PATH",
                        str(tmp_path / "cache.json"))
    monkeypatch.setattr(autotune, "_cache", None)
    keys = np.random.default_rng(1).integers(0, 2**31, 4096, dtype=np.int32)
    pay = keys + np.int32(1)
    k, p = srs.sort(keys, pay, method="autotune")
    order = np.argsort(keys, kind="stable")
    assert np.array_equal(np.asarray(k), keys[order])
