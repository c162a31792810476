"""SortConfig wiring: the config object must actually drive sort()."""

import numpy as np
import pytest

import simd_radix_sort_tpu as srt
from simd_radix_sort_tpu import config as config_mod
from simd_radix_sort_tpu.config import SortConfig


def test_defaults_match_engines():
    # the config default must defer to the radix engine's measured
    # per-key-width default (VERDICT round 1: the 8-vs-16 contradiction)
    assert config_mod.DEFAULT_DIGIT_BITS is None
    from simd_radix_sort_tpu.ops import radix
    import inspect
    src = inspect.getsource(radix._sort_arrays_sortpass)
    assert "32 if len(kops) == 2 else 16" in src


def test_config_supplies_defaults():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**32, 512, dtype=np.uint32)
    pay = rng.integers(0, 2**32, 512, dtype=np.uint32)

    cfg = SortConfig(ascending=False, method="xla")
    ko, po = srt.sort(keys, pay, config=cfg)
    ko, po = np.asarray(ko), np.asarray(po)
    assert np.all(ko[:-1] >= ko[1:])
    # pairs preserved
    got = np.stack([ko, po], 1)
    want = np.stack([keys, pay], 1)
    assert np.array_equal(got[np.lexsort((got[:, 1], got[:, 0]))],
                          want[np.lexsort((want[:, 1], want[:, 0]))])


def test_kwarg_overrides_config():
    keys = np.arange(64, dtype=np.int32)[::-1].copy()
    cfg = SortConfig(ascending=False)
    out = np.asarray(srt.sort(keys, ascending=True, config=cfg))
    assert np.all(out[:-1] <= out[1:])


def test_config_method_selection(monkeypatch):
    """config.method routes through the registry like the kwarg does."""
    from simd_radix_sort_tpu import methods
    seen = {}
    real = methods.REGISTRY["radix"].run

    def spy(keys, payloads, **kw):
        seen.update(kw)
        return real(keys, payloads, **kw)

    monkeypatch.setitem(methods.REGISTRY, "radix",
                        methods.SortMethod("radix", spy,
                                           methods.REGISTRY["radix"].supports))
    keys = np.random.default_rng(1).integers(0, 1000, 256, dtype=np.uint32)
    out = np.asarray(srt.sort(keys, config=SortConfig(method="radix",
                                                      digit_bits=8)))
    assert np.all(out[:-1] <= out[1:])
    assert seen.get("digit_bits") == 8


def test_config_rejects_unknown_method():
    with pytest.raises(ValueError, match="unknown sort method"):
        srt.sort(np.arange(8, dtype=np.int32),
                 config=SortConfig(method="nope"))
