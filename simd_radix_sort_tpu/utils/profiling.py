"""Tracing / profiling utilities.

The reference's only instrumentation is CLOCK_PROCESS_CPUTIME_ID around the
sort call (/root/reference/src/perf.hpp:33-47); SURVEY.md section 5 commits
this framework to the TPU-native upgrades: jax.profiler traces plus
roofline-normalized throughput reports per workload.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax
import numpy as np

from ..models import roofline


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/srs_trace"):
    """Capture a jax.profiler trace of the enclosed block (view with
    tensorboard / xprof).  Usage:

        with profiling.trace("/tmp/t"):
            out = srs.sort(keys, pay)
            jax.block_until_ready(out)
    """
    with jax.profiler.trace(log_dir):
        yield
    print(f"[srs] profiler trace written to {log_dir}")


@dataclasses.dataclass
class Report:
    name: str
    rows: int
    seconds: float
    rows_per_s: float
    ns_per_row: float
    roofline_rows_per_s: float
    roofline_frac: float

    def line(self) -> str:
        return (f"{self.name}: {self.rows_per_s/1e6:.1f} Mrows/s "
                f"({self.ns_per_row:.3f} ns/row), "
                f"{100*self.roofline_frac:.1f}% of HBM roofline "
                f"({self.roofline_rows_per_s/1e6:.0f} Mrows/s)")


def measure(fn, *args, name: str = "workload", rows: int | None = None,
            row_bytes: int = 16, key_bits: int = 64, passes: int | None = None,
            reps: int = 3) -> Report:
    """Time a jitted callable and normalize against the HBM roofline.

    `fn` must return jax arrays (first output is synced to fence the async
    axon/TPU dispatch, which ignores block_until_ready)."""
    out = fn(*args)
    first = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(first.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(first.ravel()[:1])
    dt = (time.perf_counter() - t0) / reps
    n = rows if rows is not None else int(np.asarray(first).shape[0])
    roof = roofline.radix_sort_roofline_rows_per_s(row_bytes, key_bits)
    rps = n / dt if dt else float("inf")
    return Report(name, n, dt, rps, dt / max(n, 1) * 1e9, roof,
                  rps / roof if roof else 0.0)
