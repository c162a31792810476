"""Execute the REAL ragged_all_to_all exchange branch on TPU hardware.

Round-1 VERDICT item 1: every test and the driver dryrun run on the CPU
virtual mesh, where dist_sort falls back to the dense all_gather emulation
(XLA:CPU has no ragged-all-to-all thunk).  This script runs
`distributed_sort` on the actual TPU with `use_ragged=True` — a 1-device
mesh compiles and executes the same `jax.lax.ragged_all_to_all` HLO the
multi-chip path issues — validates keys AND key<->payload pairing, greps
the compiled HLO for the ragged collective as proof the branch (not the
emulation) ran, and writes TPU_RAGGED_RUN.json as the committed artifact.

Run: JAX_ENABLE_X64=1 python scripts/tpu_ragged_run.py
"""

import functools
import json
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
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from simd_radix_sort_tpu.parallel import dist_sort

MIX = np.uint64(0x9E3779B97F4A7C15)


def run_case(mesh, n, key_dtype, label):
    rng = np.random.default_rng(7)
    if np.dtype(key_dtype).itemsize == 8:
        keys = rng.integers(0, 2**64, n, dtype=key_dtype)
    else:
        keys = rng.integers(0, np.iinfo(key_dtype).max, n, dtype=key_dtype)
    pay = rng.integers(0, 2**64, n, dtype=np.uint64)

    sharding = NamedSharding(mesh, P("x"))
    keys_d = jax.device_put(jnp.asarray(keys), sharding)
    pay_d = jax.device_put(jnp.asarray(pay), sharding)

    fn = jax.jit(functools.partial(
        dist_sort.distributed_sort_sharded, mesh=mesh, capacity_factor=2.0,
        samples_per_device=64, use_ragged=True))
    lowered = fn.lower(keys_d, (pay_d,))
    stablehlo = lowered.as_text()
    has_ragged_hlo = "ragged_all_to_all" in stablehlo
    compiled = lowered.compile()
    try:
        compiled_text = compiled.as_text()
    except Exception:
        compiled_text = ""
    has_ragged_compiled = "ragged-all-to-all" in compiled_text

    t0 = time.perf_counter()
    out_k, out_p, counts, overflow = compiled(keys_d, (pay_d,))
    # host fetch forces completion through the axon tunnel
    _ = np.asarray(out_k.ravel()[:1])
    dt = time.perf_counter() - t0

    got_k, got_p = dist_sort.gather_result(out_k, out_p, counts)
    assert got_k.shape == keys.shape, (got_k.shape, keys.shape)
    assert not bool(np.asarray(overflow).any()), "capacity overflow"
    assert np.all(got_k[:-1] <= got_k[1:]), "not sorted"
    assert np.array_equal(np.sort(got_k), np.sort(keys)), "key multiset"
    with np.errstate(over="ignore"):
        pair_in = (keys.astype(np.uint64) * MIX) ^ pay
        pair_out = (got_k.astype(np.uint64) * MIX) ^ got_p[0]
    assert np.array_equal(np.sort(pair_in), np.sort(pair_out)), \
        "key<->payload pairing broken"

    return {
        "case": label,
        "n": n,
        "key_dtype": str(np.dtype(key_dtype)),
        "mesh_devices": int(mesh.devices.size),
        "ragged_in_stablehlo": bool(has_ragged_hlo),
        "ragged_in_compiled_hlo": bool(has_ragged_compiled),
        "overflow": False,
        "validated": ["sorted", "key_multiset", "pair_fingerprint"],
        "wall_seconds_first_exec": round(dt, 3),
    }


def main():
    assert jax.default_backend() == "tpu", (
        "this artifact must be produced on real TPU hardware; got "
        f"{jax.default_backend()}")
    mesh = dist_sort.make_mesh()  # every local TPU device
    results = [
        run_case(mesh, 1 << 16, np.uint64, "u64 keys (hi,lo,pos) domain"),
        run_case(mesh, 1 << 16, np.uint32, "u32 keys packed-u64 domain"),
    ]
    artifact = {
        "what": "dist_sort ragged_all_to_all branch executed on real TPU "
                "(use_ragged=True; CPU tests use the dense emulation)",
        "device": str(jax.devices()[0]),
        "jax": jax.__version__,
        "cases": results,
    }
    out = os.path.join(os.path.dirname(__file__), "..", "TPU_RAGGED_RUN.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=2)
        f.write("\n")
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
