"""Summarize bench_out/*.dat against the reference's published numbers.

For every method table produced by scripts/perf_suite.py, looks up the
SAME-NAMED table in the reference's published results
(/root/reference/bachelors-thesis/data/ — 311 .dat files backing the
thesis) and prints our best device engine vs the reference's own
RadixSIMD and its best competitor row, with speedups.  Workloads the
reference never measured print without anchors.

When REF_HOST.json exists (produced by scripts/ref_perf.py — the
reference compiled and timed on THIS host's AVX-512 core under its own
perf.hpp protocol), a measured-here RadixSIMD column is printed too, so
speedups are anchored on the same silicon era, not only the thesis'
i7-12700K.

    python scripts/summarize_bench.py [bench_out]
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DIR = "/root/reference/bachelors-thesis/data"
REF_HOST = os.path.join(REPO, "REF_HOST.json")
LOSING_TRACE = os.path.join(REPO, "LOSING_TRACE_r05.json")

OUR_DEVICE_METHODS = ("xla", "radix", "count", "rank", "quick")
# the reference's own algorithm rows vs vendored competitor rows
REF_OWN = ("RadixSIMD",)
REF_SKIP = ("RadixSeq", "MoellerSeq", "STLSort")  # scalar baselines


def parse(path):
    rows = {}
    try:
        with open(path) as f:
            next(f)
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    rows[parts[0]] = float(parts[1])
    except (OSError, StopIteration):
        pass
    return rows


def load_ref_host():
    """(combo, dist, n) -> {method: ns/elem} measured on this host
    (RadixSeq/RadixSIMD/STLSort + the vendored Blacher/Bramas, all 8
    distributions since round 4)."""
    try:
        with open(REF_HOST) as f:
            report = json.load(f)
    except (OSError, ValueError):
        return {}
    out = {}
    for c in report["cells"]:
        out.setdefault((c["combo"], c["dist"], str(c["n"])), {})[
            c["method"]] = c["ns_per_elem"]
    return out


def load_device_ns():
    """(key, dist) -> best pure-device ns/elem at 2^18 from the
    dispatch-vs-device trace (scripts/losing_trace.py)."""
    try:
        with open(LOSING_TRACE) as f:
            report = json.load(f)
    except (OSError, ValueError):
        return {}
    return {tuple(name.split("-", 1)): c["best_device_ns_per_elem"]
            for name, c in report["cells"].items()}


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "bench_out"
    host = load_ref_host()
    dev_ns = load_device_ns()
    host_hdr = (f" {'here:RadixSIMD':>14s} {'x':>6s} {'here:best':>16s}"
                if host else "")
    dev_hdr = f" {'dev-ns':>7s}" if dev_ns else ""
    print(f"{'workload':44s} {'ours':>7s} {'engine':>7s} "
          f"{'RadixSIMD':>10s} {'x':>6s} {'best-other':>16s} {'x':>6s}"
          f"{host_hdr}{dev_hdr}")
    for fname in sorted(os.listdir(out_dir)):
        if not fname.endswith(".dat") or fname.startswith(
                ("tpe-", "digits-", "speedup-", "combined-", "thresh-",
                 "quickstudy-")):
            continue
        stem = fname[:-4].split("-")
        key, dist, num = stem[0], stem[-2], stem[-1]
        pays = ",".join(stem[1:-2])
        rows = {m: v for m, v in parse(os.path.join(out_dir, fname)).items()
                if m in OUR_DEVICE_METHODS}
        if not rows:
            continue
        best_m, best = min(rows.items(), key=lambda kv: kv[1])
        label = (f"{key}+{pays} {dist} n={num}" if pays
                 else f"{key} {dist} n={num}")

        combo = f"{key}+{pays}" if pays else key
        hc = host.get((combo, dist, num), {})
        h = hc.get("RadixSIMD")
        host_col = (f" {h:14.2f} {h / best:5.1f}x" if h is not None
                    else (f" {'—':>14s} {'—':>6s}" if host else ""))
        if host:
            if hc:
                hb_m, hb = min(hc.items(), key=lambda kv: kv[1])
                host_col += f" {hb:6.2f} ({hb_m[:9]:9s})"
            else:
                host_col += f" {'—':>16s}"
        dev = dev_ns.get((key, dist)) if (not pays and num == "262144") \
            else None
        dev_col = ((f" {dev:7.3f}" if dev is not None else f" {'—':>7s}")
                   if dev_ns else "")

        ref_rows = parse(os.path.join(REF_DIR, fname))
        r_own = ref_rows.get("RadixSIMD")
        others = {m: v for m, v in ref_rows.items()
                  if m not in REF_OWN + REF_SKIP}
        if r_own is not None:
            r_best_m, r_best = min(others.items(), key=lambda kv: kv[1]) \
                if others else ("-", r_own)
            print(f"{label:44s} {best:7.2f} {best_m:>7s} "
                  f"{r_own:10.2f} {r_own / best:5.1f}x "
                  f"{r_best:6.2f} ({r_best_m[:9]:9s}) {r_best / best:5.1f}x"
                  f"{host_col}{dev_col}")
        else:
            print(f"{label:44s} {best:7.2f} {best_m:>7s} "
                  f"{'—':>10s} {'—':>6s} {'—':>16s}{host_col}{dev_col}")


if __name__ == "__main__":
    main()
