"""Benchmark harness with reference-protocol parity.

Functional equivalent of /root/reference/src/perf.hpp:
  * measure_ns_per_element mirrors measureTimePerElement (perf.hpp:28-63):
    fresh dataset, layout conversion outside the timed region, the sort
    bracketed by wall timing, and the final rep's output verified against
    the oracle (perf.hpp:51-59 verifies every rep and exits on failure; we
    verify once per cell — reps are back-to-back device dispatches of the
    SAME compiled program on cycling datasets, so a per-rep host pull would
    only re-check determinism at the cost of a tunnel round trip each);
  * repetition protocol: max(1, 2^22/n) measured runs over fresh datasets
    plus max(1, 2^18/n) warmups (perf.hpp:65-89);
  * experiment families writing whitespace .dat tables with the reference's
    header rows (perf.hpp:170-211, 383-385, 435): per-method tables,
    n-scaling sweeps (perfTestNum), and tuning-knob sweeps (perfTestThresh's
    equivalent: the radix block size / method knob);
  * tables land in ./bench_out/ (the reference used /tmp/radixSortData-*).

Timing on an async backend forces completion with a host fetch of a few
output rows (block_until_ready is unreliable over the axon tunnel).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import methods as methods_mod
from .utils import common
from .utils import data as D
from .utils import transforms

OUT_DIR = os.environ.get("SRS_PERF_DIR", "bench_out")

# The reference uses 2^22/n reps (perf.hpp:65-89) for nanosecond-noise CPU
# calls; dispatch through the axon tunnel jitters by milliseconds, so each
# cell needs ~0.5-1 s of device time for a stable mean -> 16x the budget,
# still capped at 512 reps.
REPS_NUMERATOR = 1 << 26
WARMUP_NUMERATOR = 1 << 18


def _sync(arrs):
    for a in arrs:
        if isinstance(a, jax.Array):
            np.asarray(a.ravel()[:1])


MIX64 = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier, mixes key bits


def _bits64_host(x: np.ndarray) -> np.ndarray:
    """Raw bits of a host stream widened to u64 (order-free fingerprints)."""
    if x.dtype.kind == "f":
        x = x.view(np.uint32 if x.dtype.itemsize == 4 else np.uint64)
    return x.astype(np.uint64)


def _device_validate(out, keys_host, pays_host, ascending, key_is_f64,
                     pay_is_f64):
    """On-device validation for cells too large to pull through the tunnel
    (the bench.py gate generalized): exact sortedness of the output keys in
    the order-carrier domain, key multiset conservation, and a key<->payload
    PAIR fingerprint per payload stream (any dropped / duplicated /
    decoupled row breaks at least one check with overwhelming probability).
    Full-oracle host validation (the default) stays on reference-size
    cells."""
    kdt = np.float64 if key_is_f64 else None
    ko, pos = out[0], out[1]

    @jax.jit
    def gate(ko, *pos):
        kops = transforms.key_operands(ko, ascending, kdt)
        if len(kops) == 1:
            w = kops[0]
            sorted_ok = jnp.all(w[1:] >= w[:-1]) if w.shape[0] else jnp.bool_(True)
        else:
            hi, lo = kops
            sorted_ok = (jnp.all((hi[1:] > hi[:-1])
                                 | ((hi[1:] == hi[:-1]) & (lo[1:] >= lo[:-1])))
                         if hi.shape[0] else jnp.bool_(True))

        def bits64(x):
            if x.dtype.kind == "f":
                x = jax.lax.bitcast_convert_type(
                    x, jnp.uint32 if x.dtype.itemsize == 4 else jnp.uint64)
            return x.astype(jnp.uint64)

        k64 = bits64(ko)
        sums = [jnp.sum(k64), jnp.bitwise_xor.reduce(k64)]
        for p in pos:
            pair = (k64 * MIX64) ^ bits64(p)
            sums += [jnp.sum(pair), jnp.bitwise_xor.reduce(pair)]
        return (sorted_ok, *sums)

    got = [np.asarray(v) for v in gate(ko, *pos)]
    if not bool(got[0]):
        return "output keys not sorted (device gate)"
    with np.errstate(over="ignore"):
        k64h = _bits64_host(keys_host)
        want = [k64h.sum(dtype=np.uint64), np.bitwise_xor.reduce(k64h)]
        for p in pays_host:
            pair = (k64h * MIX64) ^ _bits64_host(np.asarray(p))
            want += [pair.sum(dtype=np.uint64), np.bitwise_xor.reduce(pair)]
    labels = (["key sum", "key xor"]
              + [f"pair {i // 2} {'sum' if i % 2 == 0 else 'xor'}"
                 for i in range(2 * len(pays_host))])
    for g, w, what in zip(got[1:], want, labels):
        if np.uint64(g) != np.uint64(w):
            return f"{what} fingerprint mismatch (device gate)"
    return ""


def measure_ns_per_element(method: str, num: int, key_dtype, payload_dtypes,
                           distribution=D.Distribution.UNIFORM,
                           ascending: bool = True, seed: int = 1,
                           validate=True, reps: int | None = None,
                           warmups: int | None = None) -> float:
    """ns per element for one (method, workload) cell, reference protocol.

    validate: True/"host" = the full key-seeded payload oracle on host
    (the reference protocol, perf.hpp:51-59); "device" = the on-device
    sortedness + fingerprint gate (for cells whose output is too large to
    pull through the tunnel — falls back to host for host engines);
    False = skip."""
    m = methods_mod.resolve(method, key_dtype, payload_dtypes, num)
    # capped: past a few hundred reps the mean is stable and each rep is a
    # dispatch, not a CPU call like the reference's
    reps = reps if reps is not None else min(
        512, max(1, REPS_NUMERATOR // max(num, 1)))
    warmups = (warmups if warmups is not None
               else max(1, min(64, WARMUP_NUMERATOR // max(num, 1))))
    # jit once per shape/dtype combo; data refreshed per rep like the
    # reference's fresh clone per measurement (perf.hpp:70-80).  Host
    # baselines (seq/quick/torch) run unjitted on host arrays — like the
    # reference's STLSort rows, they are not charged device transfers.
    #
    # float64 never lives on a TPU device (the X64 rewriter cannot lower
    # f64 bitcasts and device f64 storage is lossy): f64 keys/payloads
    # cross as u64 bits, exactly like the public sort() front-end.
    f64_bits = m.device and jax.default_backend() != "cpu"
    key_is_f64 = f64_bits and np.dtype(key_dtype) == np.float64
    pay_is_f64 = [f64_bits and np.dtype(p) == np.float64
                  for p in payload_dtypes]
    run = lambda k, ps: m.run(
        k, ps, ascending=ascending, stable=False, block_threshold=None,
        key_dtype=np.float64 if key_is_f64 else None)
    fn = jax.jit(run) if m.device else run

    def fresh(i):
        keys = D.make_keys(num, key_dtype, distribution, seed + i)
        pays = D.make_payloads(keys, payload_dtypes, "fast")
        if not m.device:
            return keys, tuple(pays), tuple(pays)
        staged = [p.view(np.uint64) if f64 else p
                  for p, f64 in zip(pays, pay_is_f64)]
        return keys, tuple(pays), tuple(jnp.asarray(p) for p in staged)

    if not m.device:  # python-loop baselines: a few reps suffice
        reps = min(reps, 3)
        warmups = min(warmups, 1)
    def _stage_keys(k):
        if not m.device:
            return k
        return jnp.asarray(k.view(np.uint64) if key_is_f64 else k)

    datasets = [fresh(i) for i in range(min(reps, 8))]
    for w in range(warmups):
        k, _, ps = datasets[w % len(datasets)]
        out = fn(_stage_keys(k), ps)
        _sync([out[0]])

    # Pre-stage every dataset on device, then time the whole rep loop with
    # ONE final fence.  Syncing per rep would charge each measurement a
    # full host<->device round trip (tens of ms through the axon tunnel,
    # dwarfing a sub-ms sort at the reference's n=2^18); the device
    # executes dispatches in order, so the final fence covers all reps —
    # the standard accelerator timing protocol replacing the reference's
    # per-call CPU clock (perf.hpp:33-47).
    staged = [(_stage_keys(k), ps) for k, _, ps in datasets]
    if m.device:
        _sync([kd for kd, _ in staged])
    out = None
    t0 = time.perf_counter()
    for r in range(reps):
        kd, pays = staged[r % len(staged)]
        out = fn(kd, pays)  # only the last output is kept alive
    if m.device:
        _sync([out[0]])
    total = time.perf_counter() - t0
    if validate and num and out is not None:
        keys, pays_host, _ = datasets[(reps - 1) % len(datasets)]
        if validate == "device" and m.device:
            err = _device_validate(out, keys, pays_host, ascending,
                                   key_is_f64, pay_is_f64)
        else:
            ko = np.asarray(out[0])
            if key_is_f64:
                ko = ko.view(np.float64)
            po = tuple(np.asarray(p).view(np.float64) if f64
                       else np.asarray(p)
                       for p, f64 in zip(out[1], pay_is_f64))
            err = D.check_data(ko, po, keys, ascending)
        if err:
            raise AssertionError(
                f"perf measurement produced wrong output ({err}) for "
                f"{method} {common.type_name(key_dtype)} n={num}")
    return total / reps / max(num, 1) * 1e9


def table_name(key_dtype, payload_dtypes, distribution, num: int) -> str:
    """Canonical per-workload .dat file name (shared with resume logic)."""
    return "-".join([common.type_name(key_dtype)]
                    + [common.type_name(p) for p in payload_dtypes]
                    + [distribution.value, str(num)]) + ".dat"


def _time_pipelined(fn, arg_sets, reps: int, warmups: int = 1,
                    per_rep_fence: bool = False) -> float:
    """Seconds per call: dispatch `reps` calls back-to-back cycling over
    `arg_sets`, fence once (the shared timing protocol — see
    measure_ns_per_element).

    per_rep_fence=True fences after every rep and frees the previous
    rep's output first: back-to-back dispatch keeps every queued output
    buffer live, which exhausts 16 GB HBM when one result is GBs (hit at
    the 1e8-row packed tables).  The one-element fetch costs ~ms vs ~1 s
    per sort at that scale — <1% bias, same protocol as bench.py."""
    def _first(o):
        return o[0] if isinstance(o, (tuple, list)) else o

    out = None
    for w in range(warmups):
        out = fn(*arg_sets[w % len(arg_sets)])
    _sync([_first(out)])
    t0 = time.perf_counter()
    if per_rep_fence:
        for r in range(reps):
            del out  # release the previous result before dispatching
            out = fn(*arg_sets[r % len(arg_sets)])
            _sync([_first(out)])
    else:
        for r in range(reps):
            out = fn(*arg_sets[r % len(arg_sets)])
        _sync([_first(out)])
    return (time.perf_counter() - t0) / reps


def _write_dat(name: str, header: str, rows) -> str:
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, name)
    with open(path, "w") as f:
        f.write(header + "\n")
        for row in rows:
            f.write(" ".join(str(c) for c in row) + "\n")
    return path


def perf_test(methods, num: int, key_dtype, payload_dtypes,
              distribution=D.Distribution.UNIFORM, out_name: str | None = None,
              **kw) -> str:
    """Per-method ns/elem table for one workload (PerfTest::perfTest,
    perf.hpp:418-461; header perf.hpp:435)."""
    rows = []
    for m in methods:
        # capability-gate like the reference harness (isSupported, test.cpp:80)
        meth = methods_mod.REGISTRY.get(m)
        if meth is not None and not meth.supports(
                np.dtype(key_dtype),
                tuple(np.dtype(p) for p in payload_dtypes), num):
            continue
        ns = measure_ns_per_element(m, num, key_dtype, payload_dtypes,
                                    distribution, **kw)
        rows.append((m, f"{ns:.4f}"))
    return _write_dat(out_name or table_name(key_dtype, payload_dtypes,
                                             distribution, num),
                      "sort_method nanoseconds_per_element", rows)


def perf_test_num(methods, key_dtype, payload_dtypes,
                  distribution=D.Distribution.UNIFORM,
                  max_num: int = 1 << 22, min_num: int = 1, **kw) -> str:
    """n-scaling sweep, n = min_num, 2*min_num ... max_num
    (PerfTest::perfTestNum, perf.hpp:368-416; header perf.hpp:383-385)."""
    # a method must support EVERY size in the sweep to get a column
    # (size-capped methods like rank would otherwise crash mid-table);
    # selector names (auto/autotune) are not REGISTRY keys and always pass
    def _ok(m):
        meth = methods_mod.REGISTRY.get(m)
        return meth is None or meth.supports(
            np.dtype(key_dtype),
            tuple(np.dtype(p) for p in payload_dtypes), max_num)

    methods = [m for m in methods if _ok(m)]
    rows = []
    n = max(int(min_num), 1)
    while n <= max_num:
        row = [n]
        for m in methods:
            row.append(f"{measure_ns_per_element(m, n, key_dtype, payload_dtypes, distribution, **kw):.4f}")
        rows.append(row)
        n *= 2
    name = "tpe-" + "-".join([common.type_name(key_dtype)]
                             + [common.type_name(p) for p in payload_dtypes]
                             + [distribution.value]) + ".dat"
    return _write_dat(name, "number_of_elements " + " ".join(methods), rows)


def perf_test_block(num: int, key_dtype, payload_dtypes,
                    digits=(4, 8, 16, 32),
                    distribution=D.Distribution.UNIFORM,
                    seed: int = 1) -> str:
    """Tuning-knob sweep: radix digit width — the engine's analogue of the
    reference's cmpSortThreshold sweep (perfTestThresh, perf.hpp:159-212):
    the knob that trades pass count against per-pass cost."""
    from .ops import radix
    rows = []
    keys = D.make_keys(num, key_dtype, distribution, seed)
    pays_h = D.make_payloads(keys, payload_dtypes, "fast")
    # f64 crosses the device boundary as u64 bits (the X64 rewriter cannot
    # lower f64 bitcasts on TPU) — same staging as perf_test_thresh
    f64_bits = jax.default_backend() != "cpu"
    key_is_f64 = f64_bits and np.dtype(key_dtype) == np.float64
    kd = jnp.asarray(keys.view(np.uint64) if key_is_f64 else keys)
    pays = tuple(jnp.asarray(
        p.view(np.uint64) if f64_bits and np.dtype(p.dtype) == np.float64
        else p) for p in pays_h)
    reps = min(512, max(1, REPS_NUMERATOR // max(num, 1)))
    for b in digits:
        fn = jax.jit(lambda k, ps, b=b: radix.sort_arrays(
            k, ps, digit_bits=b,
            key_dtype=np.float64 if key_is_f64 else None))
        sec = _time_pipelined(fn, [(kd, pays)], reps)
        rows.append((b, f"{sec / max(num, 1) * 1e9:.4f}"))
    name = "digits-" + "-".join([common.type_name(key_dtype)]
                                + [common.type_name(p) for p in payload_dtypes]
                                + [distribution.value, str(num)]) + ".dat"
    return _write_dat(name, "digitBits nanoseconds_per_element", rows)


def perf_test_thresh(num: int, key_dtype, payload_dtypes,
                     thresholds=(128, 256, 512, 1024, 2048, 4096),
                     distribution=D.Distribution.UNIFORM,
                     seed: int = 1) -> str:
    """cmpSortThreshold sweep (perfTestThresh, perf.hpp:159-212): the
    device quicksort's block_threshold sets the target segment size of the
    sampled-splitter partition — the same pass-count vs base-case-cost
    trade the reference's threshold controls."""
    from .ops import quick_sort
    rows = []
    keys = D.make_keys(num, key_dtype, distribution, seed)
    pays = D.make_payloads(keys, payload_dtypes, "fast")
    # f64 crosses the device boundary as u64 bits (the X64 rewriter cannot
    # lower f64 bitcasts on TPU) — same staging as measure_ns_per_element
    f64_bits = jax.default_backend() != "cpu"
    key_is_f64 = f64_bits and np.dtype(key_dtype) == np.float64
    kd = jnp.asarray(keys.view(np.uint64) if key_is_f64 else keys)
    pays = tuple(jnp.asarray(
        p.view(np.uint64) if f64_bits and np.dtype(p.dtype) == np.float64
        else p) for p in pays)
    reps = min(256, max(1, REPS_NUMERATOR // max(num, 1)))
    for t in thresholds:
        fn = jax.jit(lambda k, ps, t=t: quick_sort.sort_arrays(
            k, ps, block_threshold=t,
            key_dtype=np.float64 if key_is_f64 else None))
        sec = _time_pipelined(fn, [(kd, pays)], reps)
        rows.append((t, f"{sec / max(num, 1) * 1e9:.4f}"))
    name = ("thresh-quick-"
            + "-".join([common.type_name(key_dtype)]
                       + [common.type_name(p) for p in payload_dtypes]
                       + [distribution.value, str(num)]) + ".dat")
    return _write_dat(name, "cmpThresh nanoseconds_per_element", rows)


def _payload_combo_for_factor(key_dtype, factor: int):
    """Payload streams totalling factor * sizeof(key) bytes, mirroring the
    reference's payload-size-factor studies (perfTestSpeedupAllKP,
    perf.hpp:214-362)."""
    size = np.dtype(key_dtype).itemsize * factor
    out = []
    while size >= 8:
        out.append(np.uint64)
        size -= 8
    for dt, b in ((np.uint32, 4), (np.uint16, 2), (np.uint8, 1)):
        while size >= b:
            out.append(dt)
            size -= b
    return tuple(out)


def perf_test_speedup(method_a: str, method_b: str, num: int,
                      key_dtypes=(np.uint32, np.int32, np.float32),
                      factors=(1, 2, 4, 8),
                      distribution=D.Distribution.UNIFORM, **kw) -> str:
    """Pairwise speedup table of method_a over method_b across key types
    and payload-size factors (perfTestSpeedup[AllKP/All],
    perf.hpp:214-362)."""
    rows = []
    for k in key_dtypes:
        row = [common.type_name(k)]
        for f in factors:
            ps = _payload_combo_for_factor(k, f)
            a = measure_ns_per_element(method_a, num, k, ps, distribution, **kw)
            b = measure_ns_per_element(method_b, num, k, ps, distribution, **kw)
            row.append(f"{b / a:.4f}")
        rows.append(row)
    name = (f"speedup-{method_a}-vs-{method_b}-{distribution.value}-{num}"
            ".dat")
    header = "key_type " + " ".join(f"factor{f}" for f in factors)
    return _write_dat(name, header, rows)


def perf_test_packed(num: int, key_dtype, payload_dtypes,
                     methods=("xla", "radix", "quick"),
                     distribution=D.Distribution.UNIFORM, seed: int = 1,
                     reps: int | None = None,
                     validate: bool = True) -> str:
    """Combined-layout ENGINE table: sort_packed(method=...) per device
    engine at one workload — the packed-path crossover study enabled by
    routing sort_packed through the method facade (round 5; reference
    combined entry src/radix_sort.hpp:314-332).  AoS conversion happens
    outside the timed region like the reference harness (perf.hpp:28-63);
    each engine's output is validated with the payload oracle."""
    from .ops import sort as sort_mod
    reps = reps if reps is not None else min(
        512, max(1, REPS_NUMERATOR // max(num, 1)))
    keys = D.make_keys(num, key_dtype, distribution, seed)
    pays = D.make_payloads(keys, payload_dtypes, "fast")
    packed = jnp.asarray(sort_mod.pack_rows(keys, pays))

    rows = []
    for m in methods:
        meth = methods_mod.REGISTRY.get(m)
        # pseudo payload streams of the packed transport: u32 words + u8 tail
        pbytes = sum(np.dtype(p).itemsize for p in payload_dtypes)
        pseudo = (np.dtype(np.uint32),) * (pbytes // 4) \
            + (np.dtype(np.uint8),) * (pbytes % 4)
        if meth is not None and not meth.supports(
                np.dtype(key_dtype), pseudo, num):
            continue
        fn = jax.jit(lambda p, m=m: sort_mod.sort_packed(
            p, key_dtype, method=m))
        sec = _time_pipelined(fn, [(packed,)], reps,
                              per_rep_fence=num >= (1 << 25))
        if validate and num:
            out = np.asarray(fn(packed))
            ko, po = sort_mod.unpack_rows(out, key_dtype, payload_dtypes)
            err = D.check_data(ko, po, keys, True)
            if err:
                raise AssertionError(
                    f"packed perf produced wrong output ({err}) for "
                    f"{m} {common.type_name(key_dtype)} n={num}")
        rows.append((m, f"{sec / max(num, 1) * 1e9:.4f}"))
    name = "packed-" + "-".join(
        [common.type_name(key_dtype)]
        + [common.type_name(p) for p in payload_dtypes]
        + [distribution.value, str(num)]) + ".dat"
    return _write_dat(name, "sort_method nanoseconds_per_element", rows)


def perf_test_combined(num: int, key_dtype, payload_dtypes,
                       distribution=D.Distribution.UNIFORM, seed: int = 1,
                       reps: int | None = None) -> str:
    """Separate-stream vs combined-layout (AoS) cost for one workload — the
    reference's "+Combined" variant study (sort_methods.hpp:24-98).  The
    AoS<->SoA conversion happens outside the timed region, exactly like the
    reference harness (perf.hpp:28-63)."""
    from .ops import sort as sort_mod
    from .ops import xla_sort as xla_sort_mod
    reps = reps if reps is not None else min(
        512, max(1, REPS_NUMERATOR // max(num, 1)))
    keys = D.make_keys(num, key_dtype, distribution, seed)
    pays = D.make_payloads(keys, payload_dtypes, "fast")

    rows = []
    # separate streams
    sep = jax.jit(lambda k, ps: xla_sort_mod.sort_arrays(k, ps))
    kd = jnp.asarray(keys)
    ps = tuple(jnp.asarray(p) for p in pays)
    sec = _time_pipelined(sep, [(kd, ps)], reps)
    rows.append(("separate", f"{sec / max(num, 1) * 1e9:.4f}"))

    # combined layout
    packed = jnp.asarray(sort_mod.pack_rows(keys, pays))
    comb = jax.jit(lambda p: sort_mod.sort_packed(p, key_dtype))
    sec = _time_pipelined(comb, [(packed,)], reps)
    rows.append(("combined", f"{sec / max(num, 1) * 1e9:.4f}"))

    name = "combined-" + "-".join(
        [common.type_name(key_dtype)]
        + [common.type_name(p) for p in payload_dtypes]
        + [distribution.value, str(num)]) + ".dat"
    return _write_dat(name, "layout nanoseconds_per_element", rows)
