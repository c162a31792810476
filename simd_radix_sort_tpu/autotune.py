"""Empirical method selection with a persistent cache.

The reference tunes its cmpSortThreshold per key type empirically and bakes
the findings into its benchmark configurations (thesis tex:3322-3340); the
TPU equivalent tunes the ENGINE per workload shape: measure every supported
device method once on a synthetic workload of the same (key dtype, payload
dtypes, n-bucket), cache the winner, and let `sort(..., method="autotune")`
use it.

Cache entries key on (key dtype, payload dtypes, log2-size bucket, device
kind) and persist to SRS_AUTOTUNE_CACHE (default ~/.cache/srs_autotune.json)
so the cost is paid once per machine."""

from __future__ import annotations

import json
import math
import os

import jax
import numpy as np

from . import methods as methods_mod

_CACHE_PATH = os.environ.get(
    "SRS_AUTOTUNE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "srs_autotune.json"))
_cache: dict[str, str] | None = None

# host baselines are never candidates: they exist for differential testing
_CANDIDATES = ("xla", "radix", "count", "rank", "quick")


def _key(key_dtype, payload_dtypes, n: int) -> str:
    bucket = max(8, int(math.log2(max(n, 1))))
    dev = getattr(jax.devices()[0], "device_kind", "cpu").replace(" ", "")
    pd = ",".join(np.dtype(p).name for p in payload_dtypes)
    return f"{np.dtype(key_dtype).name}|{pd}|2^{bucket}|{dev}"


def _load() -> dict:
    global _cache
    if _cache is None:
        try:
            with open(_CACHE_PATH) as f:
                _cache = json.load(f)
        except Exception:
            _cache = {}
    return _cache


def _store():
    try:
        os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
        with open(_CACHE_PATH, "w") as f:
            json.dump(_cache, f, indent=1)
    except OSError:
        pass  # read-only environments just lose persistence


def pick_method(key_dtype, payload_dtypes=(), n: int = 1 << 20,
                reps: int = 3, refresh: bool = False) -> str:
    """Return the fastest registered device method for this workload shape,
    measuring once and caching."""
    cache = _load()
    k = _key(key_dtype, payload_dtypes, n)
    pdts = tuple(np.dtype(p) for p in payload_dtypes)
    if not refresh and k in cache:
        m = methods_mod.REGISTRY.get(cache[k])
        # cache entries are per size-BUCKET: a winner measured at the small
        # end may not support every n in the bucket (e.g. rank's cap)
        if m is not None and m.supports(np.dtype(key_dtype), pdts, n):
            return cache[k]

    from . import perf
    from .utils import data as D
    # candidates must support the whole bucket, not just this n, so the
    # cached winner is valid for every later query mapping to the bucket
    bucket_hi = 1 << (max(8, int(math.log2(max(n, 1)))) + 1)
    best, best_ns = None, float("inf")
    for name in _CANDIDATES:
        m = methods_mod.REGISTRY[name]
        if not (m.supports(np.dtype(key_dtype), pdts, n)
                and m.supports(np.dtype(key_dtype), pdts, bucket_hi)):
            continue
        try:
            ns = perf.measure_ns_per_element(
                name, n, key_dtype, payload_dtypes,
                D.Distribution.UNIFORM, reps=reps, warmups=1,
                validate=False)
        except Exception as e:  # pragma: no cover - engine regression path
            import warnings
            warnings.warn(
                f"autotune: candidate {name!r} failed for {k}: "
                f"{type(e).__name__}: {e}", RuntimeWarning)
            continue
        if ns < best_ns:
            best, best_ns = name, ns
    if best is None:
        best = "xla"
    cache[k] = best
    _store()
    return best
