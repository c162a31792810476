"""Time the ACTUAL reference implementation on THIS host (VERDICT r02
item 4): builds scripts/ref_perf.cpp against /root/reference/src (full
AVX-512 — avx512f/bw/dq/vl/vbmi/vbmi2, verified present) and runs the
reference's own perf protocol (perf.hpp:28-89) for the headline combos.

Every speedup in RESULTS.md was previously cross-hardware (TPU v5e vs
the thesis' i7-12700K@5GHz).  This produces a measured-here reference
column on the same silicon era, written to REF_HOST.json, which
scripts/summarize_bench.py merges into RESULTS.md when present.

Run idle (1-core host — never while a TPU measurement is live):
  python scripts/ref_perf.py              # all combos -> REF_HOST.json
  python scripts/ref_perf.py --combo float --n 262144
"""

import argparse
import hashlib
import json
import os
import platform
import subprocess
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SRS_REFERENCE_SRC", "/root/reference/src")
WORK = os.environ.get("SRS_GOLDEN_WORK", "/tmp/srs_golden")
CXXFLAGS = ("-std=c++20 -O2 -mavx512f -mavx512bw -mavx512dq -mavx512vl "
            "-mavx512vbmi -mavx512vbmi2").split()

COMBOS = ["float", "double", "int8", "uint8", "int16", "int32", "int64",
          "float+int32", "double+double", "int32+int32", "uint64+uint64"]


def build() -> str:
    os.makedirs(WORK, exist_ok=True)
    cpp = os.path.join(REPO, "scripts", "ref_perf.cpp")
    src = open(cpp).read()
    tag = hashlib.sha256(
        (src + " ".join(CXXFLAGS) + SRC).encode()).hexdigest()[:16]
    binary = os.path.join(WORK, f"ref_perf_{tag}")
    if not os.path.exists(binary):
        t0 = time.time()
        subprocess.run(["g++", *CXXFLAGS, f"-I{SRC}", cpp, "-o", binary],
                       check=True)
        print(f"compiled reference perf driver ({time.time() - t0:.1f} s)",
              flush=True)
    return binary


def cpu_model() -> str:
    try:
        for line in open("/proc/cpuinfo"):
            if line.startswith("model name"):
                return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return platform.processor()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 18)
    ap.add_argument("--combo", default=None, choices=COMBOS)
    ap.add_argument("--out", default=os.path.join(REPO, "REF_HOST.json"))
    ap.add_argument("--resume", action="store_true",
                    help="skip combos already recorded in --out (the "
                         "sweep now covers 8 dists x 5 methods and can "
                         "outlive one watchdog window)")
    args = ap.parse_args()

    binary = build()
    combos = [args.combo] if args.combo else COMBOS
    cells = []
    done = []
    if args.resume and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        done = prev.get("done_combos", [])
        cells = [c for c in prev.get("cells", []) if c["combo"] in done]

    def write():
        report = {"cpu": cpu_model(), "nproc": os.cpu_count(),
                  "cxxflags": " ".join(CXXFLAGS), "source": SRC,
                  "protocol":
                      "perf.hpp measureTimePerElementWithRepsAndWarmup",
                  "done_combos": done, "cells": cells}
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")

    for c in combos:
        if c in done:
            print(f"  [{c}: already done, skipping]", flush=True)
            continue
        t0 = time.time()
        res = subprocess.run([binary, str(args.n), c], capture_output=True,
                             text=True, check=True)
        for line in res.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                cell = json.loads(line)
                cells.append(cell)
                print(f"{cell['combo']:14s} {cell['dist']:8s} "
                      f"{cell['method']:10s} {cell['ns_per_elem']:8.3f} "
                      f"ns/elem", flush=True)
        done.append(c)
        write()  # incremental: a killed run loses one combo at most
        print(f"  [{c}: {time.time() - t0:.1f} s]", flush=True)

    print(f"{len(cells)} cells -> {args.out}")


if __name__ == "__main__":
    main()
