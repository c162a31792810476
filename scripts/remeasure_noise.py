"""Re-measure the noise-suspect cells in one clean epoch (VERDICT r03
item 7 / weak item 6).

Cells flagged as probable epoch noise in the committed tables:
  * int32+int32 Sorted n=2^18 — 2.14 ns/elem vs 1.2-1.3 for its siblings
  * uint64 Sorted n=2^18 — 1.75 vs 1.30-1.56 siblings
  * int32+int32 / uint64+uint64 n=4096 rank rows — small-n cells where
    the dispatch floor dominates and scatter is worst

Regenerates those whole tables (same names, same protocol) so RESULTS.md
can be refreshed and annotated with the epoch.  Run IDLE, never
concurrent with other chip or host work.

Usage: python scripts/remeasure_noise.py
"""

import sys
import time

import benchlib  # noqa: F401  (jax config)
import numpy as np

from simd_radix_sort_tpu import perf
from simd_radix_sort_tpu.utils import data as D

METHODS = ["xla", "radix", "count", "quick", "seq", "torch", "cpp"]


def main():
    t0 = time.time()
    jobs = [
        lambda: perf.perf_test(METHODS, 1 << 18, np.int32, (np.int32,),
                               D.Distribution.SORTED),
        lambda: perf.perf_test(METHODS, 1 << 18, np.uint64, (),
                               D.Distribution.SORTED),
        lambda: perf.perf_test(METHODS + ["rank"], 4096, np.int32,
                               (np.int32,), D.Distribution.UNIFORM,
                               reps=64, warmups=2),
        lambda: perf.perf_test(METHODS + ["rank"], 4096, np.uint64,
                               (np.uint64,), D.Distribution.UNIFORM,
                               reps=64, warmups=2),
    ]
    for job in jobs:
        path = job()
        print("wrote", path, flush=True)
    print(f"noise re-measure epoch done in {time.time() - t0:.1f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
