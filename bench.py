"""Headline benchmark: u64 key + u64 payload radix sort rows/s/chip.

Metric per BASELINE.json: "radix sort rows/s/chip (u64 key + u64 payload,
1e8 rows)".  vs_baseline is relative to the reference's closest published
anchor: RadixSIMD int32+int32 at 89 Mrows/s on one 5 GHz x86 core
(BASELINE.md; the reference publishes no u64+u64 row and is single-threaded).

Prints ONE JSON line.  Environment knobs:
  SRS_BENCH_N          rows (default 100_000_000)
  SRS_BENCH_REPS       timed repetitions (default 3)
  SRS_BENCH_METHOD     sort method (default "auto")
  SRS_BENCH_TIMEOUT_S  hard watchdog (default 2400 s): the axon tunnel
                       can wedge indefinitely (observed round 3:
                       jax.devices() itself hangs) — better a loud
                       nonzero exit than a silent driver stall
"""

import json
import os
import sys
import threading
import time

_TIMEOUT_S = float(os.environ.get("SRS_BENCH_TIMEOUT_S", 2400))


def _watchdog():
    time.sleep(_TIMEOUT_S)
    print(f"bench.py: watchdog expired after {_TIMEOUT_S:.0f} s "
          "(TPU backend/tunnel unresponsive?) — aborting", file=sys.stderr,
          flush=True)
    os._exit(3)


threading.Thread(target=_watchdog, daemon=True).start()

# NOTE: jax is pre-imported by sitecustomize in this environment, so
# JAX_ENABLE_X64 env vars set here are too late; use config.update.
import jax

jax.config.update("jax_enable_x64", True)
# persistent compile cache: axon remote compiles take 20-60 s per shape,
# one line makes re-runs ~free (measured 16.2 s -> 0.1 s)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 os.path.expanduser("~/.cache/jax_comp_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

BASELINE_ROWS_PER_S = 89e6  # reference RadixSIMD int32+int32 (BASELINE.md)


def main():
    from simd_radix_sort_tpu import methods
    from simd_radix_sort_tpu.models import roofline

    n = int(os.environ.get("SRS_BENCH_N", 100_000_000))
    reps = int(os.environ.get("SRS_BENCH_REPS", 3))
    method = os.environ.get("SRS_BENCH_METHOD", "auto")

    rng = np.random.default_rng(42)
    keys = rng.integers(0, 2**64, n, dtype=np.uint64)
    payload = rng.integers(0, 2**64, n, dtype=np.uint64)
    keys_d = jax.device_put(jnp.asarray(keys))
    pay_d = jax.device_put(jnp.asarray(payload))

    m = methods.resolve(method, np.uint64, (np.uint64,), n)

    def run(k, p):
        ko, (po,) = m.run(k, (p,), ascending=True, stable=False,
                          block_threshold=None, key_dtype=None)
        return ko, po

    fn = jax.jit(run)

    # warmup/compile; a host fetch forces completion on async backends
    out = fn(keys_d, pay_d)
    _ = np.asarray(out[0][:8])

    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(keys_d, pay_d)
        _ = np.asarray(out[0][:8])  # sync
    dt = (time.perf_counter() - t0) / reps
    rows_per_s = n / dt

    # correctness gate, like the reference perf harness (perf.hpp:51-59).
    # Pulling the full 1.6 GB result through the tunnel would take minutes,
    # so the checks run on device: exact sortedness, plus multiset
    # conservation via order-independent checksums (sum and xor mod 2^64 of
    # keys and payloads — any dropped/duplicated/corrupted row breaks at
    # least one with overwhelming probability), plus a host sample of
    # key<->payload correspondence.
    MIX = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier mixes key bits

    @jax.jit
    def gate(ko, po):
        sorted_ok = jnp.all(ko[:-1] <= ko[1:])
        pair = (ko * MIX) ^ po  # order-independent PAIR fingerprint
        return (sorted_ok, jnp.sum(ko), jnp.bitwise_xor.reduce(ko),
                jnp.sum(pair), jnp.bitwise_xor.reduce(pair))

    sorted_ok, ks, kx, prs, prx = (np.asarray(v) for v in gate(*out))
    assert bool(sorted_ok), "benchmark output not sorted"
    with np.errstate(over="ignore"):
        in_ks = keys.sum(dtype=np.uint64)
        in_kx = np.bitwise_xor.reduce(keys)
        in_pair = (keys * MIX) ^ payload
        in_prs = in_pair.sum(dtype=np.uint64)
        in_prx = np.bitwise_xor.reduce(in_pair)
    assert (ks, kx) == (in_ks, in_kx), "key multiset checksum mismatch"
    # the pair fingerprint catches payloads decoupled from their keys
    assert (prs, prx) == (in_prs, in_prx), "key<->payload pairing broken"

    roof = roofline.radix_sort_roofline_rows_per_s(row_bytes=16, key_bits=64)
    print(json.dumps({
        "metric": "u64+u64 sort rows/s/chip",
        "value": round(rows_per_s),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_s / BASELINE_ROWS_PER_S, 3),
        "n": n,
        "method": m.name,
        "seconds_per_sort": round(dt, 4),
        "hbm_roofline_rows_per_s": round(roof),
        "roofline_frac": round(rows_per_s / roof, 4),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())
