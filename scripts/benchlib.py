"""Shared harness for the standalone measurement scripts in scripts/.

Centralizes the three things every script needs (they were copy-pasted
four times before this): jax setup with x64 + the persistent compile
cache, the pipelined-reps/one-fence timer, and the host fence that
actually completes work through the axon tunnel (block_until_ready does
not)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
# persistent compile cache: axon remote compiles take 20-60 s per shape,
# one line makes re-runs ~free (measured 16.2 s -> 0.1 s)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 os.path.expanduser("~/.cache/jax_comp_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# The axon TPU plugin forces jax_platforms at registration, so the
# JAX_PLATFORMS env var is silently ignored; honor an explicit override
# (SRS_PLATFORM=cpu runs any measurement script on the host backend).
if os.environ.get("SRS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SRS_PLATFORM"])

import numpy as np  # noqa: E402


M1 = np.uint64(0x9E3779B97F4A7C15)
M2 = np.uint64(0xBF58476D1CE4E5B9)
M3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x):
    """The canonical splitmix64 mixer (same algorithm as
    utils/data._splitmix64, restated here for jnp arrays): externally
    reproducible, so a C++/NumPy cross-check regenerates identical
    benchmark streams."""
    z = x + M1
    z = (z ^ (z >> np.uint64(30))) * M2
    z = (z ^ (z >> np.uint64(27))) * M3
    return z ^ (z >> np.uint64(31))


def fence(out) -> None:
    """Force completion with a host fetch (tunnel-safe fence).

    Slices one element per axis BEFORE flattening: ravel()[:1] on a
    >2^31-element array lowers to a 64-bit-index dynamic_slice that the
    TPU X64 rewriter rejects (hit at 1e8 x 24 u8 rows)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    corner = leaf[tuple(slice(0, 1) for _ in range(leaf.ndim))]
    np.asarray(corner)


def timeit(fn, args, reps: int = 5, warmup: int = 2,
           per_rep_fence: bool = False) -> float:
    """Seconds per call: warm up, dispatch reps back-to-back, fence ONCE
    (per-rep fences measure the tunnel, not the chip — BENCH_NOTES.md).

    per_rep_fence=True fences (one-element host fetch) after every rep
    and frees the previous rep's output first.  Use it when one result
    is GBs: back-to-back dispatch keeps every queued rep's output buffer
    live, which OOMs 16 GB HBM at 1e8 x 24 B rows.  The fetch costs ~ms
    through the tunnel vs ~1 s per sort at that scale (<1% bias), the
    same protocol bench.py uses for the 1.6 GB headline."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    if out is None:  # warmup=0: prime once so the fence has a value
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    if per_rep_fence:
        for _ in range(reps):
            del out  # release the previous 2.4 GB result before dispatch
            out = fn(*args)
            fence(out)
    else:
        for _ in range(reps):
            out = fn(*args)
        fence(out)
    return (time.perf_counter() - t0) / reps
