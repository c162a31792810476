"""Sort-method facade: a uniform registry over heterogeneous sort engines.

TPU-native re-design of the reference's SortMethod adapter layer
(/root/reference/src/sort_methods.hpp:24-347): each method exposes `name`,
`supports(...)` (the isSupported<Up,K,Ps...> capability predicate,
sort_methods.hpp:45-57), `has_threshold`, and a `run(...)` entry, so the test
matrix and benchmark harness can iterate heterogeneous algorithms uniformly.

Methods:
  * "xla"    — transform + jax.lax.sort variadic comparison sort (the
               general-purpose engine; fastest measured for key+payload)
  * "radix"  — LSD digit passes (stable-sort mover; scatter engine kept
               for differential testing)
  * "count"  — Pallas counting/histogram sort, keys-only narrow or
               adaptive small-range integer keys
  * "rank"   — single-block vectorized rank sort (cmp_sorters.hpp
               equivalent, MXU permutation apply)
  * "quick"  — DEVICE quicksort: sampled-splitter multiway partition +
               batched blocked cleanup (ops/quick_sort.sort_arrays)
  * "quickseq" — host model with the reference's exact pivot/recursion
               semantics (QuickSeq role; differential oracle)
  * "torch"  — torch.sort host baseline (external-comparison role)
  * "cpp"    — native threaded C++ LSD byte radix (harness.cpp; the
               vendored-native-baseline role)
  * "seq"    — host NumPy stable-argsort model (BitSorterSequential
               analogue; differential baseline)
Special selectors: "auto" (static policy), "autotune" (measured, cached).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np

from .utils import common
from .utils import transforms


@dataclasses.dataclass(frozen=True)
class SortMethod:
    name: str
    run: Callable  # (keys, payloads, *, ascending, stable, block_threshold) -> (keys, payloads)
    supports: Callable  # (key_dtype, payload_dtypes, n) -> bool
    has_threshold: bool = False
    device: bool = True  # False for host-side differential baselines


def _supports_all(key_dtype, payload_dtypes, n) -> bool:
    return True


def _run_xla(keys, payloads, *, ascending=True, stable=False,
             block_threshold=None, digit_bits=None, key_dtype=None):
    from .ops import xla_sort
    return xla_sort.sort_arrays(keys, payloads, ascending=ascending,
                                stable=stable, key_dtype=key_dtype)


def _host_method(sort_fn, takes_threshold: bool = False):
    """Adapter for host-side baseline engines: converts inputs to host
    arrays, round-trips f64-as-bits keys (key_dtype protocol), and returns
    HOST arrays — converting f64 results to device arrays would be lossy
    on TPU (f64 device storage is emulated)."""
    def run(keys, payloads, *, ascending=True, stable=False,
            block_threshold=None, digit_bits=None, key_dtype=None):
        keys = np.asarray(keys)
        if key_dtype is not None:
            keys = keys.view(np.dtype(key_dtype))
        kw = ({"threshold": block_threshold}
              if takes_threshold and block_threshold is not None else {})
        out = sort_fn(keys, *[np.asarray(p) for p in payloads],
                      ascending=ascending, **kw)
        keys_out = out[0]
        if key_dtype is not None:  # hand bits back, like the device methods
            keys_out = keys_out.view(common.unsigned_of(key_dtype))
        return keys_out, tuple(out[1:])
    return run


def _run_seq(keys, payloads, **kw):
    return _host_method(transforms.sort_np)(keys, payloads, **kw)


def _run_radix(keys, payloads, *, ascending=True, stable=False,
               block_threshold=None, digit_bits=None, key_dtype=None):
    from .ops import radix
    return radix.sort_arrays(keys, payloads, ascending=ascending,
                             stable=stable, digit_bits=digit_bits,
                             key_dtype=key_dtype)


def _run_rank(keys, payloads, *, ascending=True, stable=False,
              block_threshold=None, digit_bits=None, key_dtype=None):
    from .ops import rank_sort
    return rank_sort.sort_arrays(keys, payloads, ascending=ascending,
                                 key_dtype=key_dtype)


def _rank_supports(key_dtype, payload_dtypes, n) -> bool:
    from .ops import rank_sort
    return n is None or n <= rank_sort.MAX_RANK_SORT_N


def _run_count(keys, payloads, *, ascending=True, stable=False,
               block_threshold=None, digit_bits=None, key_dtype=None):
    from .ops import counting
    assert not payloads
    return counting.sort_keys(keys, ascending=ascending, key_dtype=key_dtype)


def _run_quick(keys, payloads, *, ascending=True, stable=False,
               block_threshold=None, digit_bits=None, key_dtype=None):
    from .ops import quick_sort
    return quick_sort.sort_arrays(keys, payloads, ascending=ascending,
                                  stable=stable,
                                  block_threshold=block_threshold,
                                  key_dtype=key_dtype)


def _run_quickseq(keys, payloads, **kw):
    from .ops import quick_sort
    return _host_method(quick_sort.sort_np,
                        takes_threshold=True)(keys, payloads, **kw)


def _run_torch(keys, payloads, **kw):
    from .ops import torch_baseline
    return _host_method(torch_baseline.sort_np)(keys, payloads, **kw)


def _run_cpp(keys, payloads, **kw):
    from .utils import native
    return _host_method(native.sort_np)(keys, payloads, **kw)


def _cpp_supports(key_dtype, payload_dtypes, n) -> bool:
    from .utils import native
    return native.available()


def _count_supports(key_dtype, payload_dtypes, n) -> bool:
    from .ops import counting
    return counting.supports(key_dtype, payload_dtypes, n)


REGISTRY: dict[str, SortMethod] = {}


def register(method: SortMethod):
    REGISTRY[method.name] = method


register(SortMethod("xla", _run_xla, _supports_all))
# radix's tuning knob is digit width (perf.perf_test_block sweeps it), not a
# recursion threshold — LSD passes have no comparison-sort base case
register(SortMethod("radix", _run_radix, _supports_all))
register(SortMethod("rank", _run_rank, _rank_supports))
register(SortMethod("count", _run_count, _count_supports))
register(SortMethod("quick", _run_quick, _supports_all, has_threshold=True))
# QuickSeq analogue (sort_methods.hpp:100-167): the host differential model
# with the reference's exact pivot/recursion semantics
register(SortMethod("quickseq", _run_quickseq, _supports_all,
                    has_threshold=True, device=False))
register(SortMethod("torch", _run_torch, _supports_all, device=False))
register(SortMethod("seq", _run_seq, _supports_all, device=False))
# the framework's own native-code baseline (threaded C++ LSD byte radix,
# native/harness.cpp srs_radix_argsort) — the role the reference's vendored
# bramas/blacher/IPP baselines play (sort_methods.hpp:270-347)
register(SortMethod("cpp", _run_cpp, _cpp_supports, device=False))


# Measured engine crossovers for the static "auto" policy (round-2
# re-measured tables, one consistent idle epoch; regression-tested by
# tests/test_auto_policy.py against the committed .dat files):
#
#   * 1-byte keys run a FIXED 256-bucket counting sort (no runtime
#     fallback): the clean scaling sweep (tpe-uint8-Uniform.dat) crosses
#     at ~2^17 (count 1.76 vs xla 2.23 ns/elem at 131072; 0.61 vs 1.48 at
#     2^20) — at 2^18 the two engines tie within measurement noise across
#     distributions (uint8-*-262144.dat: ratios 0.67x-1.41x), so the
#     sweep's crossover decides.
#   * 2-4-byte integer keys use the ADAPTIVE engine (runtime range check
#     with in-jit comparison-sort fallback): at 2^18 the fallback's
#     min/max pass plus block padding leaves count 1.2-1.6x behind xla on
#     every distribution (int32/uint32/int16-*-262144.dat), so the
#     comparison sort holds until counting's flat cost wins at large n
#     (tiny-range counting measured 2.15 Gelem/s at 1e8 in round 1 vs
#     ~0.7 G for the full sort).
COUNT_CROSSOVER_N_1BYTE = 1 << 17
# == counting.SMALL_MIN_N, the engine's own 1024-bucket branch gate
# (single source of truth asserted by tests/test_auto_policy.py)
COUNT_MIN_N_ADAPTIVE = 1 << 21


def resolve(method: str, key_dtype, payload_dtypes: Sequence, n: int | None
            ) -> SortMethod:
    """Pick a method; "auto" chooses the best supported engine for the shape
    (mirrors how the reference harness picks per-workload configurations,
    backed by on-chip measurements — see bench_notes in perf.py)."""
    if method == "auto":
        kdt = np.dtype(key_dtype)
        if _count_supports(kdt, tuple(np.dtype(d) for d in payload_dtypes),
                           n):
            floor = (COUNT_CROSSOVER_N_1BYTE if kdt.itemsize == 1
                     else COUNT_MIN_N_ADAPTIVE)
            if n is None or n >= floor:
                return REGISTRY["count"]
        return REGISTRY["xla"]
    if method == "autotune":
        # measure-once-and-cache selection (the reference's empirical
        # threshold tuning, engine-level)
        from . import autotune
        return REGISTRY[autotune.pick_method(key_dtype, payload_dtypes,
                                             n or (1 << 20))]
    m = REGISTRY.get(method)
    if m is None:
        raise ValueError(f"unknown sort method {method!r}; "
                         f"have {sorted(REGISTRY)}")
    if not m.supports(np.dtype(key_dtype),
                      tuple(np.dtype(d) for d in payload_dtypes), n):
        raise ValueError(
            f"method {method!r} does not support key={key_dtype} "
            f"payloads={payload_dtypes} n={n}")
    return m
