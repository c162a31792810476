"""Perf harness smoke tests (CPU): protocol, gating, table formats."""

import os

import numpy as np
import pytest

from simd_radix_sort_tpu import perf
from simd_radix_sort_tpu.utils import data as D


def test_measure_validates_and_returns_ns(tmp_path):
    ns = perf.measure_ns_per_element("xla", 4096, np.int32, (np.uint8,),
                                     D.Distribution.UNIFORM, reps=2,
                                     warmups=1)
    assert ns > 0


def test_measure_host_method():
    ns = perf.measure_ns_per_element("seq", 2048, np.float32, (),
                                     D.Distribution.GAUSSIAN, reps=2,
                                     warmups=1)
    assert ns > 0


def test_perf_test_writes_dat(tmp_path, monkeypatch):
    monkeypatch.setattr(perf, "OUT_DIR", str(tmp_path))
    path = perf.perf_test(["xla", "count", "rank"], 2048, np.uint8, (),
                          D.Distribution.UNIFORM, reps=1, warmups=1)
    lines = open(path).read().strip().splitlines()
    assert lines[0] == "sort_method nanoseconds_per_element"
    methods = [l.split()[0] for l in lines[1:]]
    assert methods == ["xla", "count", "rank"]


def test_perf_test_gates_unsupported(tmp_path, monkeypatch):
    monkeypatch.setattr(perf, "OUT_DIR", str(tmp_path))
    # count is keys-only: must be skipped when payloads present
    path = perf.perf_test(["xla", "count"], 1024, np.uint8, (np.uint8,),
                          D.Distribution.UNIFORM, reps=1, warmups=1)
    lines = open(path).read().strip().splitlines()
    assert [l.split()[0] for l in lines[1:]] == ["xla"]


def test_speedup_table(tmp_path, monkeypatch):
    monkeypatch.setattr(perf, "OUT_DIR", str(tmp_path))
    path = perf.perf_test_speedup("xla", "rank", 1024,
                                  key_dtypes=(np.uint32,), factors=(1, 2),
                                  reps=1, warmups=1)
    lines = open(path).read().strip().splitlines()
    assert lines[0] == "key_type factor1 factor2"
    assert lines[1].split()[0] == "uint32"
    assert all(float(x) > 0 for x in lines[1].split()[1:])


def test_measure_device_validate_mode():
    """validate="device" (sortedness + fingerprint gate, for cells too
    large to pull through the tunnel) passes on a correct engine across
    the carrier shapes: 1-word, 2-word (u64), and f64-as-bits keys."""
    for kdt, pdts in [(np.int32, (np.uint32,)), (np.uint64, (np.uint64,)),
                      (np.float64, (np.int64,))]:
        ns = perf.measure_ns_per_element("xla", 4096, kdt, pdts,
                                         D.Distribution.GAUSSIAN, reps=2,
                                         warmups=1, validate="device")
        assert ns > 0


def test_device_validate_catches_bad_output():
    import jax.numpy as jnp
    keys = D.make_keys(512, np.int32, D.Distribution.UNIFORM, 3)
    pays = D.make_payloads(keys, (np.uint32,), "fast")
    good = (jnp.asarray(np.sort(keys)),
            (jnp.asarray(pays[0][np.argsort(keys, kind="stable")]),))
    assert perf._device_validate(good, keys, pays, True, False, [False]) == ""
    unsorted = (jnp.asarray(keys), (jnp.asarray(pays[0]),))
    assert "not sorted" in perf._device_validate(
        unsorted, keys, pays, True, False, [False])
    # sorted but a corrupted payload row -> pair fingerprint must trip
    bad_pay = pays[0].copy()
    bad_pay[0] ^= np.uint32(1)
    decoupled = (good[0], (jnp.asarray(
        bad_pay[np.argsort(keys, kind="stable")]),))
    assert "fingerprint" in perf._device_validate(
        decoupled, keys, pays, True, False, [False])


def test_perf_test_packed_writes_dat(tmp_path, monkeypatch):
    monkeypatch.setattr(perf, "OUT_DIR", str(tmp_path))
    path = perf.perf_test_packed(1024, np.int32, (np.uint32,),
                                 methods=("xla", "radix"), reps=1)
    lines = open(path).read().strip().splitlines()
    assert lines[0] == "sort_method nanoseconds_per_element"
    assert [l.split()[0] for l in lines[1:]] == ["xla", "radix"]
