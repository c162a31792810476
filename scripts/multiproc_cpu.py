"""Real multi-PROCESS run of the DCN-tier code paths on one host.

The hierarchical (DCN x ICI) layer was, until this script, exercised only
through single-process `num_slices` overrides — `jax.distributed`
initialization, cross-process device enumeration, the process-grouped
mesh builder (`multihost.make_hierarchical_mesh`'s `by_proc` branch), and
the uneven-devices error path had never executed with more than one
process.  This launcher spawns N REAL OS processes on the CPU backend
(Gloo cross-process collectives), each holding D local virtual devices,
and drives end to end:

  1. `multihost.init_distributed` + cross-process device enumeration
     (process_count == N, global devices == N*D);
  2. `make_hierarchical_mesh()` with NO overrides — the `by_proc`
     grouping builds the (slice=N, x=D) mesh from actual process
     topology;
  3. `hierarchical_sort_sharded` (u64 keys + u64 payload) over that mesh
     — phase-1 splitters + exchange cross the REAL process boundary on
     the `slice` axis; validated against NumPy on every process;
  4. `hierarchical_group_aggregate_sharded` (sum+count partials) —
     two-tier partial routing across processes; validated vs a NumPy
     groupby;
  5. flat `distributed_sort_sharded` over the flattened N*D-device axis
     (the `distributed_sort_multihost` topology);
  6. `--uneven` mode: processes get DIFFERENT device counts and the mesh
     builder must raise the uneven-devices ValueError on every process.

The reference is single-process by construction (SURVEY.md section 2.11;
bachelors-thesis.tex:4190-4203 lists multithreading as future work) —
this is the north star's scale-out tier, tested at the process level the
way a TPU pod run would be, minus only the hardware.

Usage:
  python scripts/multiproc_cpu.py                 # 2 procs x 2 devs
  python scripts/multiproc_cpu.py --procs 4
  python scripts/multiproc_cpu.py --uneven        # error-path check
  python scripts/multiproc_cpu.py --all           # 2p, 4p, and uneven

CI: `./ci.sh --multiproc` runs `--all` (opt-in; ~2-3 min on this host).
"""

import argparse
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------------------------
# worker
# --------------------------------------------------------------------------

def worker(pid: int, nproc: int, ndev: int, port: int, uneven: bool):
    import jax
    jax.config.update("jax_platforms", "cpu")  # axon plugin forces its own
    jax.config.update("jax_num_cpu_devices",
                      ndev if not uneven else ndev + pid)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    sys.path.insert(0, REPO)
    from simd_radix_sort_tpu.parallel import dist_sort, dist_ops, multihost

    def say(msg):
        print(f"[proc {pid}] {msg}", flush=True)

    multihost.init_distributed(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, (jax.process_count(), nproc)
    nloc = len(jax.local_devices())
    say(f"process_count={jax.process_count()} local_devices={nloc} "
        f"global_devices={len(jax.devices())}")

    if uneven:
        # the by_proc grouping must reject ragged process->device maps
        try:
            multihost.make_hierarchical_mesh()
        except ValueError as e:
            assert "uneven devices" in str(e), e
            say(f"uneven-devices error path OK: {e}")
            return
        raise AssertionError("make_hierarchical_mesh accepted an uneven "
                             "process->device grouping")

    assert len(jax.devices()) == nproc * ndev

    # ---- the by_proc branch: mesh from real process topology ------------
    mesh = multihost.make_hierarchical_mesh()
    assert dict(mesh.shape) == {"slice": nproc, "x": ndev}, mesh.shape
    # every row of the device grid must belong to exactly one process
    for s in range(nproc):
        procs = {d.process_index for d in mesh.devices[s]}
        assert len(procs) == 1, f"slice {s} spans processes {procs}"
    say(f"by_proc hierarchical mesh OK: {dict(mesh.shape)}")

    num_p = nproc * ndev
    n = 1 << 14
    n_local_proc = n // nproc  # rows this process contributes

    rng = np.random.default_rng(20260819)  # same stream on every process
    keys = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
    pays = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)

    spec = P(("slice", "x"))
    sharding = NamedSharding(mesh, spec)

    def to_global(host_arr):
        lo = pid * n_local_proc
        return jax.make_array_from_process_local_data(
            sharding, host_arr[lo:lo + n_local_proc], host_arr.shape)

    def fetch(x):
        """Replicate a global sharded array so the host can read it."""
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    # ---- hierarchical sort across the real process boundary -------------
    kd, payd = to_global(keys), to_global(pays)
    import functools
    sort_fn = jax.jit(functools.partial(
        multihost.hierarchical_sort_sharded, mesh=mesh))
    out_k, (out_p,), counts, overflow = sort_fn(kd, (payd,))
    counts_h = fetch(counts)
    assert int(fetch(overflow).max()) == 0, "capacity overflow"
    ks, (ps,) = dist_sort.gather_result(fetch(out_k), (fetch(out_p),),
                                        counts_h)
    order = np.argsort(keys, kind="stable")
    assert np.array_equal(ks, keys[order]), "hierarchical sort: keys wrong"
    # duplicate keys may permute among themselves; check pairing instead
    def canon(a, b):
        o = np.lexsort((b, a))
        return a[o], b[o]
    got, want = canon(ks, ps), canon(keys, pays)
    assert np.array_equal(got[0], want[0]) and \
        np.array_equal(got[1], want[1]), \
        "hierarchical sort: key/payload pairing wrong"
    say(f"hierarchical_sort over {nproc} processes OK "
        f"(n={n}, per-device counts={counts_h.tolist()})")

    # ---- hierarchical two-tier aggregate ---------------------------------
    gkeys = (keys % np.uint64(257)).astype(np.uint64)
    gvals = pays
    gk_d, gv_d = to_global(gkeys), to_global(gvals)
    agg_fn = jax.jit(functools.partial(
        multihost.hierarchical_group_aggregate_sharded, mesh=mesh,
        aggs_req=("sum",)))
    cnts, gk_out, sums_out, ov = agg_fn(gk_d, gv_d)
    assert int(fetch(ov).max()) == 0, "aggregate capacity overflow"
    gk_all, (sum_all,) = dist_sort.gather_result(
        fetch(gk_out), (fetch(sums_out),), fetch(cnts))
    uk, inv = np.unique(gkeys, return_inverse=True)
    ref_sums = np.zeros(uk.size, dtype=np.uint64)
    np.add.at(ref_sums, inv, gvals)
    assert np.array_equal(gk_all, uk), "aggregate: group keys wrong"
    assert np.array_equal(sum_all, ref_sums), "aggregate: sums wrong"
    say(f"hierarchical_group_aggregate over {nproc} processes OK "
        f"({uk.size} groups)")

    # ---- flat single-axis sort over all N*D devices ----------------------
    flat = Mesh(mesh.devices.reshape(-1), ("x",))
    fsh = NamedSharding(flat, P("x"))
    kd2 = jax.make_array_from_process_local_data(
        fsh, keys[pid * n_local_proc:(pid + 1) * n_local_proc], keys.shape)
    flat_fn = jax.jit(functools.partial(
        dist_sort.distributed_sort_sharded, mesh=flat))
    fk, _, fcnt, fov = flat_fn(kd2, ())
    assert int(fetch(fov).max()) == 0
    fks, _ = dist_sort.gather_result(fetch(fk), (), fetch(fcnt))
    assert np.array_equal(fks, np.sort(keys)), "flat sort: keys wrong"
    say(f"flat distributed_sort over {num_p} devices OK")

    say("ALL OK")


# --------------------------------------------------------------------------
# launcher
# --------------------------------------------------------------------------

def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(nproc: int, ndev: int, uneven: bool, timeout: float) -> bool:
    port = free_port()
    tag = "uneven" if uneven else f"{nproc}p x {ndev}d"
    print(f"=== launching {nproc} processes ({tag}, coordinator port "
          f"{port}) ===", flush=True)
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    procs = []
    for pid in range(nproc):
        cmd = [sys.executable, os.path.abspath(__file__), "--role", "worker",
               "--process-id", str(pid), "--procs", str(nproc),
               "--devices-per-proc", str(ndev), "--port", str(port)]
        if uneven:
            cmd.append("--uneven")
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    deadline = time.monotonic() + timeout
    ok = True
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=max(1.0, deadline - time.monotonic()))
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += f"\n[launcher] proc {pid} TIMED OUT after {timeout}s"
        for line in out.splitlines():
            if "WARNING" in line and "experimental" in line:
                continue
            print(line, flush=True)
        if p.returncode != 0:
            ok = False
            print(f"[launcher] proc {pid} exited {p.returncode}", flush=True)
    print(f"=== {tag}: {'PASS' if ok else 'FAIL'} ===", flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", choices=("launcher", "worker"),
                    default="launcher")
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--uneven", action="store_true")
    ap.add_argument("--all", action="store_true",
                    help="run 2-proc, 4-proc, and uneven error-path legs")
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()

    if args.role == "worker":
        worker(args.process_id, args.procs, args.devices_per_proc,
               args.port, args.uneven)
        return

    if args.all:
        legs = [(2, 2, False), (4, 1, False), (2, 2, True)]
    else:
        legs = [(args.procs, args.devices_per_proc, args.uneven)]
    results = [launch(np_, nd, un, args.timeout) for np_, nd, un in legs]
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
