"""Auto-policy regression (round-1 VERDICT item 2 — auto must never pick
a 1.7x-slower engine at the reference's own benchmark size).

Two bars against the committed benchmark tables:
  * <= 1.2x of the best recorded device engine on the headline
    distributions (Uniform, Gaussian) — the reference's published rows;
  * <= 1.6x on every other full-size table — a blunder catch, not a
    ranking: sibling tables of the SAME engines and distribution class
    scatter 0.65x-1.53x at n=2^18 (int32/uint32/int16-Zero count/xla
    ratios), i.e. per-cell noise through the axon tunnel exceeds any
    1.2x bar off the headline set.
Dispatch-bound small-n tables (n < 2^15, ~1-2 ms per dispatch through
the axon tunnel) are excluded: they rank tunnel latency, not engines.
"""

import os
import re

import numpy as np

from simd_radix_sort_tpu import methods

BENCH_DIR = os.path.join(os.path.dirname(__file__), "..", "bench_out")

_DTYPES = {"uint8": np.uint8, "uint16": np.uint16, "uint32": np.uint32,
           "uint64": np.uint64, "int8": np.int8, "int16": np.int16,
           "int32": np.int32, "int64": np.int64, "float": np.float32,
           "double": np.float64}

# method tables: <key>[-<payload>...]-<Distribution>-<n>.dat
_NAME = re.compile(
    r"^((?:%(t)s)(?:-(?:%(t)s))*)-([A-Za-z]+)-(\d+)\.dat$"
    % {"t": "|".join(_DTYPES)})

HEADLINE_DISTS = ("Uniform", "Gaussian")
MIN_N = 1 << 15


def _method_tables():
    for fname in sorted(os.listdir(BENCH_DIR)):
        m = _NAME.match(fname)
        if not m:
            continue
        types = m.group(1).split("-")
        n = int(m.group(3))
        with open(os.path.join(BENCH_DIR, fname)) as f:
            header = f.readline().split()
            if header[:1] != ["sort_method"]:
                continue
            rows = dict(line.split() for line in f if line.strip())
        yield (fname, _DTYPES[types[0]], [_DTYPES[t] for t in types[1:]], n,
               m.group(2), {k: float(v) for k, v in rows.items()})


def test_auto_within_tolerance_of_best_recorded():
    checked = 0
    for fname, kdt, pdts, n, dist, rows in _method_tables():
        if n < MIN_N:
            continue
        device_rows = {k: v for k, v in rows.items()
                       if k in methods.REGISTRY and methods.REGISTRY[k].device}
        if not device_rows:
            continue
        pick = methods.resolve("auto", kdt, pdts, n).name
        if pick not in rows:
            continue  # table predates the engine; perf suite refresh adds it
        best = min(device_rows.values())
        bar = 1.2 if dist in HEADLINE_DISTS else 1.6
        assert rows[pick] <= bar * best, (
            f"{fname}: auto picked {pick} ({rows[pick]} ns/elem) but best "
            f"recorded is {best} ns/elem ({min(device_rows, key=rows.get)})")
        checked += 1
    assert checked >= 20, f"only {checked} tables checked"


def test_auto_crossover_direction():
    """Below the crossover auto uses the comparison sort; above, counting."""
    assert methods.resolve("auto", np.uint8, (), 1 << 16).name == "xla"
    assert methods.resolve("auto", np.uint8, (),
                           methods.COUNT_CROSSOVER_N_1BYTE).name == "count"
    # adaptive-range engine for wider integer keys only at large n
    assert methods.resolve("auto", np.int32, (), 1 << 18).name == "xla"
    assert methods.resolve("auto", np.int32, (),
                           methods.COUNT_MIN_N_ADAPTIVE).name == "count"
    # payloads exclude counting at any size
    assert methods.resolve("auto", np.uint8, (np.uint32,),
                           1 << 26).name == "xla"
    # 64-bit keys are never count-eligible (split carriers)
    assert methods.resolve("auto", np.uint64, (), 1 << 26).name == "xla"


def test_scaling_tables_support_large_n_count_pick():
    """The tpe-uint8 sweep must justify the count crossover."""
    path = os.path.join(BENCH_DIR, "tpe-uint8-Uniform.dat")
    with open(path) as f:
        header = f.readline().split()
        assert header[0] == "number_of_elements"
        cols = header[1:]
        for line in f:
            vals = line.split()
            n = int(vals[0])
            row = dict(zip(cols, map(float, vals[1:])))
            if (n >= methods.COUNT_CROSSOVER_N_1BYTE
                    and {"xla", "count"} <= set(row)):
                # 10% slack: consecutive sweep rows jitter a few percent
                assert row["count"] <= 1.1 * row["xla"], (n, row)
