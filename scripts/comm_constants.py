"""Measure the communication constants the scaling model previously assumed
(round-5; VERDICT r04 "What's weak" 3: "the scaling prediction's constants
are assumptions").

Three legs, one artifact (COMM_CONSTANTS_r05.json):

1. **Cross-process Gloo exchange bandwidth** — N real OS processes under
   `jax.distributed` (Gloo CPU collectives), 1 device each, running the
   ACTUAL dist_sort exchange program (`exchange_by_bounds` inside
   shard_map; XLA:CPU uses the dense all_gather emulation) on
   [u64 key, u64 payload] shards at n_local >= 2^21 rows — sizes where
   bytes, not latency, dominate.  The fitted bytes/s/process is the
   measured software-stack floor of the DCN-tier exchange path (loopback
   transport: it bounds protocol/serialization cost, not a NIC).
2. **Virtual-mesh exchange bandwidth** — the same program single-process
   over 8 CPU devices: the ICI-analogue term of the scaling curves' dense
   emulation (SCALING_CURVES work-inflation gap, VERDICT weak 6).
3. **Small-collective latency** — a dependent chain of scalar psums,
   cross-process and virtual-mesh: the measured analogue of
   models/scaling.COLLECTIVE_LATENCY_S.

The fitted constants are pasted into models/scaling.MEASURED_COMM with
provenance comments; tests/test_scaling_model.py pins the propagation.

Usage:
  python scripts/comm_constants.py            # all legs -> JSON
  python scripts/comm_constants.py --quick    # smaller sizes (CI smoke)
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "COMM_CONSTANTS_r05.json")

ROW_BYTES = 16  # u64 key + u64 payload = 4 u32 streams


# --------------------------------------------------------------------------
# measurement core (runs inside a worker process or the vmesh leg)
# --------------------------------------------------------------------------

def measure_mesh(mesh, axis, n_local, reps, say):
    """Time (a) the exchange program alone and (b) the full distributed
    sort on `mesh` with n_local [u64,u64] rows per device.  Returns a dict
    with seconds and the bytes accounting of the dense emulation."""
    import functools
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from simd_radix_sort_tpu.parallel import dist_sort

    num_p = mesh.shape[axis]
    n = n_local * num_p
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
    pays = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
    sharding = NamedSharding(mesh, P(axis))

    if jax.process_count() > 1:
        pid = jax.process_index()
        npp = n // jax.process_count()

        def put(a):
            return jax.make_array_from_process_local_data(
                sharding, a[pid * npp:(pid + 1) * npp], a.shape)
    else:
        def put(a):
            return jax.device_put(jnp.asarray(a), sharding)

    kd, pd = put(keys), put(pays)

    # -- exchange-only program: uniform contiguous buckets (bounds known
    # statically), so the timed region is the collective alone ------------
    cap = n_local  # exactly one shard arrives per device under uniform cuts
    bounds_np = (np.arange(1, num_p, dtype=np.int32)
                 * (n_local // num_p)).astype(np.int32)

    def exch_only(k, p):
        from simd_radix_sort_tpu.utils import transforms
        hi, lo = transforms.split64(k)
        phi, plo = transforms.split64(p)
        recv, tot, ov = dist_sort.exchange_by_bounds(
            (hi, lo, phi, plo), jnp.asarray(bounds_np), axis, cap,
            use_ragged=False)
        # reduce to tiny outputs so nothing is DCE'd but nothing large is
        # copied out
        return sum(jnp.sum(r, dtype=jnp.uint32) for r in recv), tot, ov

    # out_specs: per-device scalars get the axis dim appended
    exch = jax.jit(jax.shard_map(
        lambda k, p: tuple(x[None] for x in exch_only(k, p)),
        mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis))))

    out = exch(kd, pd)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = exch(kd, pd)
        jax.block_until_ready(out)
    t_exch = (time.perf_counter() - t0) / reps

    # -- full distributed sort (phase decomposition context) --------------
    fn = jax.jit(functools.partial(dist_sort.distributed_sort_sharded,
                                   mesh=mesh, axis=axis))
    out = fn(kd, (pd,))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(kd, (pd,))
        jax.block_until_ready(out)
    t_sort = (time.perf_counter() - t0) / reps

    # -- dependent-chain collective latency --------------------------------
    CHAIN = 64

    def lat_body(k, p):
        c = jnp.float32(jax.lax.axis_index(axis))

        def step(c, _):
            # re-vary the carry after the psum: shard_map requires the
            # scan carry's varying-axes type to stay fixed, and a psum
            # output is axis-invariant
            s = jax.lax.psum(c, axis) / num_p
            return s + jax.lax.axis_index(axis).astype(jnp.float32) * 1e-6, \
                None

        c, _ = jax.lax.scan(step, c, None, length=CHAIN)
        return c[None]

    lat = jax.jit(jax.shard_map(lat_body, mesh=mesh,
                                in_specs=(P(axis), P(axis)),
                                out_specs=P(axis)))
    out = lat(kd, pd)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = lat(kd, pd)
        jax.block_until_ready(out)
    t_lat = (time.perf_counter() - t0) / reps / CHAIN

    # bytes accounting of the dense emulation: every device all_gathers
    # each full stream -> receives (P-1) * n_local * ROW_BYTES cross-device
    # bytes (its own shard stays local)
    cross_bytes = (num_p - 1) * n_local * ROW_BYTES
    rec = {
        "n_local": n_local, "num_devices": int(num_p), "reps": reps,
        "exchange_s": t_exch, "full_sort_s": t_sort,
        "collective_latency_s": t_lat,
        "cross_bytes_per_device": cross_bytes,
        "exchange_bytes_per_s_per_device": cross_bytes / t_exch,
    }
    say(f"P={num_p} n_local={n_local}: exchange {t_exch*1e3:.1f} ms "
        f"({cross_bytes / t_exch / 1e9:.3f} GB/s/dev cross), "
        f"full sort {t_sort*1e3:.1f} ms, "
        f"latency {t_lat*1e6:.1f} us/collective")
    return rec


# --------------------------------------------------------------------------
# multi-process worker / launcher plumbing
# --------------------------------------------------------------------------

def worker(pid, nproc, port, sizes, reps):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, REPO)
    from simd_radix_sort_tpu.parallel import multihost

    multihost.init_distributed(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)

    def say(msg):
        if pid == 0:
            print(f"[gloo {nproc}p] {msg}", flush=True)

    mesh = Mesh(np.array(jax.devices()), ("x",))
    recs = [measure_mesh(mesh, "x", nl, reps, say) for nl in sizes]
    if pid == 0:
        print("RESULT " + json.dumps(recs), flush=True)


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch_gloo(nproc, sizes, reps, timeout):
    port = free_port()
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--role", "worker",
         "--process-id", str(pid), "--procs", str(nproc),
         "--port", str(port), "--sizes", ",".join(map(str, sizes)),
         "--reps", str(reps)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)]
    recs = None
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += f"\n[launcher] proc {pid} TIMED OUT"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                recs = json.loads(line[len("RESULT "):])
            elif "WARNING" not in line:
                print(line, flush=True)
        if p.returncode != 0:
            raise RuntimeError(f"gloo worker {pid} exited {p.returncode}")
    return recs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", choices=("main", "worker"), default="main")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--sizes", default="")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--timeout", type=float, default=1200.0)
    args = ap.parse_args()

    if args.role == "worker":
        worker(args.process_id, args.procs, args.port,
               [int(s) for s in args.sizes.split(",")], args.reps)
        return

    gloo_sizes = [1 << 20, 1 << 21] if args.quick else [1 << 21, 1 << 22]
    vm_sizes = [1 << 18, 1 << 19] if args.quick else [1 << 19, 1 << 20]

    report = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
              "row_bytes": ROW_BYTES,
              "transport_note": (
                  "Gloo legs run N REAL OS processes on ONE host "
                  "(loopback transport, single time-sliced core): the "
                  "fitted bytes/s is the software-stack floor of the "
                  "cross-process exchange path (serialization + copies + "
                  "Gloo protocol), NOT a NIC measurement — no multi-host "
                  "hardware is reachable here.")}

    # leg 1: real processes over Gloo
    for nproc in (2, 4):
        report[f"gloo_{nproc}proc"] = launch_gloo(
            nproc, gloo_sizes, args.reps, args.timeout)

    # leg 2: single-process virtual 8-device mesh
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    from jax.sharding import Mesh
    sys.path.insert(0, REPO)

    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    say = lambda m: print(f"[vmesh 8d] {m}", flush=True)
    report["vmesh_8dev"] = [measure_mesh(mesh, "x", nl, args.reps, say)
                            for nl in vm_sizes]

    # fitted constants: bandwidth from the LARGEST size of each leg (most
    # bandwidth-dominated), latency from the dependent psum chain
    def fit(leg):
        r = leg[-1]
        return r["exchange_bytes_per_s_per_device"], r["collective_latency_s"]

    g2, l2 = fit(report["gloo_2proc"])
    g4, l4 = fit(report["gloo_4proc"])
    vm, lvm = fit(report["vmesh_8dev"])
    report["fitted"] = {
        "gloo_bytes_per_s_per_proc": min(g2, g4),
        "gloo_bytes_per_s_per_proc_by_p": {"2": g2, "4": g4},
        "vmesh_exchange_bytes_per_s_per_dev": vm,
        "collective_latency_s_gloo": max(l2, l4),
        "collective_latency_s_vmesh": lvm,
    }

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(json.dumps(report["fitted"], indent=1))
    print(f"-> {OUT}")


if __name__ == "__main__":
    main()
