"""Summarize bench_out/*.dat against the reference's published numbers.

Reads the method tables produced by scripts/perf_suite.py and prints one
line per workload: our best engine vs the reference's own RadixSIMD and its
best vendored competitor (BASELINE.md rows), with speedups.

    python scripts/summarize_bench.py [bench_out]
"""

import os
import sys

# (key, payloads, dist) -> (reference RadixSIMD ns/elem, best other, label)
REFERENCE = {
    ("int32", "", "Uniform"): (10.16, 2.45, "BlacherSort"),
    ("int32", "int32", "Uniform"): (11.19, 4.53, "RadixSIMDNoCmp"),
    ("float", "", "Uniform"): (11.30, 4.95, "IPPRadix"),
    ("float", "int32", "Uniform"): (12.95, 5.61, "RadixSIMDNoCmp"),
    ("double", "", "Uniform"): (16.46, 7.57, "BramasSort"),
    ("double", "double", "Uniform"): (23.76, 23.76, "RadixSIMD"),
    ("uint8", "", "Uniform"): (0.497, 0.226, "IPPRadix"),
    ("int16", "", "Uniform"): (8.06, 3.18, "IPPRadix"),
    ("int32", "", "Gaussian"): (3.69, 3.69, "RadixSIMD"),
    ("int32", "", "Zero"): (2.62, 2.47, "MoellerCompress"),
}


def parse(path):
    rows = {}
    with open(path) as f:
        next(f)
        for line in f:
            parts = line.split()
            if len(parts) == 2:
                rows[parts[0]] = float(parts[1])
    return rows


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "bench_out"
    print(f"{'workload':34s} {'ours':>7s} {'engine':>7s} "
          f"{'RadixSIMD':>10s} {'x':>5s} {'best-other':>11s} {'x':>5s}")
    for fname in sorted(os.listdir(out_dir)):
        if not fname.endswith(".dat") or fname.startswith(("tpe-", "digits-",
                                                           "speedup-",
                                                           "combined-")):
            continue
        stem = fname[:-4].split("-")
        key, dist, num = stem[0], stem[-2], stem[-1]
        pays = ",".join(stem[1:-2])
        rows = {m: v for m, v in parse(os.path.join(out_dir, fname)).items()
                if m in ("xla", "radix", "count", "rank")}
        if not rows:
            continue
        best_m, best = min(rows.items(), key=lambda kv: kv[1])
        ref = REFERENCE.get((key, pays, dist))
        label = f"{key}+{pays} {dist} n={num}" if pays else f"{key} {dist} n={num}"
        if ref:
            r_own, r_best, r_name = ref
            print(f"{label:34s} {best:7.2f} {best_m:>7s} "
                  f"{r_own:10.2f} {r_own / best:4.1f}x "
                  f"{r_best:6.2f} ({r_name[:9]:9s}) {r_best / best:4.1f}x")
        else:
            print(f"{label:34s} {best:7.2f} {best_m:>7s} "
                  f"{'—':>10s} {'—':>5s} {'—':>11s}")


if __name__ == "__main__":
    main()
