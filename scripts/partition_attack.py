"""Round-3 headline attack: single-pass fine-grained partition at 1e8.

Round-2 VERDICT item 2: the one untried headline design is a single
C ~ n/4096-way partition pass (bucket ids computed in O(log C) or O(1)
per row, NOT the O(n*C) broadcast compare that forced MAX_BUCKETS=1024)
followed by the measured ~1 Gelem/s blocked cleanup.  This script
measures every component of that design at headline scale (n=1e8,
[u64 key, u64 payload] as 4 u32 streams) so the design is either
implemented or refuted WITH numbers (reference hot loop this would
replace: /root/reference/src/radix_sort.hpp:109-268).

Components, each timed on the real chip:

  1. full       — one lax.sort keyed (hi,lo): the shipped headline path.
  2. mover      — one UNSTABLE lax.sort keyed on a precomputed u32 bucket
                  id (5 streams moved).  The design's bulk mover; if this
                  is not meaningfully faster than `full`, the design is
                  dead no matter how cheap binning is (the cleanup and
                  binning only ADD to it).
  3. cleanup    — the two-phase offset blocked batched sort over
                  (n/16384, 16384) blocks keyed (b,hi,lo): the base case.
  4. bin_take   — bucket ids via jnp.take from a 65536-entry prefix->rank
                  table indexed by the key's top 16 bits (one gather/row
                  from a VMEM-resident table).
  5. bin_mxu    — same table lookup on the MXU: one-hot(hi16) @ table as
                  bf16 einsum, value split into two <256 words so every
                  partial is exact in bf16 (the round-2 joint-nibble
                  histogram pattern, ops/counting.py, run in reverse).
  6. bin_search — jnp.searchsorted(splitters, key) at C=24576 (O(log C)
                  gathers per row).
  7. bin_bcast  — the shipped O(n*C) broadcast compare at C=1024 for
                  scale (ops/quick_sort.py:_bucket_ids).

Prints the composed design estimate bin + mover + cleanup vs `full`, and
an e2e check (bin_take -> mover -> cleanup == full sort) at 4M rows.

Run idle: JAX_ENABLE_X64=1 python scripts/partition_attack.py [--n N]
"""

import argparse

from benchlib import jax, np, timeit  # noqa: F401  (jax configured there)
import jax.numpy as jnp

BLOCK = 16384
THR = 4096


def blocked_cleanup(b, streams, n):
    """Two-phase offset blocked sort keyed (b, hi, lo) — the quick
    engine's base case (ops/quick_sort.py:220-234), 3 key words."""
    ops = (b,) + tuple(streams)

    def phase(ops, offset):
        m = n - BLOCK if offset else n
        body = [o[offset: offset + m].reshape(m // BLOCK, BLOCK)
                for o in ops]
        out = jax.lax.sort(tuple(body), dimension=1, num_keys=3,
                           is_stable=False)
        return tuple(jnp.concatenate([o[:offset], s.reshape(m),
                                      o[offset + m:]])
                     for o, s in zip(ops, out))

    return phase(phase(ops, 0), BLOCK // 2)


def make_table(keys_hi: np.ndarray, c: int):
    """prefix->bucket rank table over the top 16 bits, from a host
    sample: table[v] = how many of the c-1 splitters have hi16 < v."""
    spl = np.quantile(keys_hi >> 16, np.arange(1, c) / c).astype(np.uint32)
    table = np.searchsorted(np.sort(spl), np.arange(65536),
                            side="right").astype(np.uint32)
    return table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    ap.add_argument("--all", action="store_true",
                    help="include the pathological bin_search/bin_bcast "
                         "candidates (searchsorted hangs the remote "
                         "compiler at C~24k)")
    args = ap.parse_args()
    n = (args.n // BLOCK) * BLOCK
    c = max(2, n // THR)
    rng = np.random.default_rng(3)
    host = [rng.integers(0, 2**32, n, dtype=np.uint32) for _ in range(4)]
    streams = [jnp.asarray(h) for h in host]  # key (hi,lo) + payload
    print(f"n={n:,}  C={c:,} (target segment {THR})")

    full = jax.jit(lambda *s: jax.lax.sort(s, num_keys=2))
    dt_full = timeit(full, streams)
    print(f"1. full lax.sort [u64,u64]      {n/dt_full/1e6:8.1f} Mrows/s"
          f"  ({dt_full*1e3:7.1f} ms)")

    # precomputed bucket ids approximating the post-binning distribution
    b_host = ((host[0].astype(np.uint64) * c) >> 32).astype(np.uint32)
    b = jnp.asarray(b_host)
    mover = jax.jit(lambda b, *s: jax.lax.sort(
        (b,) + s, num_keys=1, is_stable=False))
    dt_mover = timeit(mover, [b] + streams)
    print(f"2. mover 1-key sort (5 streams) {n/dt_mover/1e6:8.1f} Mrows/s"
          f"  ({dt_mover*1e3:7.1f} ms)")

    clean = jax.jit(lambda b, *s: blocked_cleanup(b, s, n))
    dt_clean = timeit(clean, [b] + streams)
    print(f"3. blocked cleanup (2 phases)   {n/dt_clean/1e6:8.1f} Mrows/s"
          f"  ({dt_clean*1e3:7.1f} ms)")

    table_np = make_table(host[0], c)
    table = jnp.asarray(table_np)
    bin_take = jax.jit(lambda t, hi: jnp.take(t, (hi >> 16).astype(
        jnp.int32)))
    dt_take = timeit(bin_take, [table, streams[0]])
    print(f"4. bin_take  table[hi16]        {n/dt_take/1e6:8.1f} Mrows/s"
          f"  ({dt_take*1e3:7.1f} ms)")

    # MXU one-hot lookup: value split v = 256*vh + vl, each word < 256 is
    # exact in bf16; one-hot (chunk, 65536) bf16 @ (65536, 2) bf16.  The
    # one-hot materializes 65536 bf16 lanes PER ROW (131 KB/row of HBM
    # traffic unless XLA keeps it virtual), so measure the per-row rate on
    # a subset — at the full 1e8 it would write terabytes if not fused.
    t2 = jnp.stack([(table >> 8).astype(jnp.bfloat16),
                    (table & 0xFF).astype(jnp.bfloat16)], axis=1)
    n_mxu = 64 * 8192

    def mxu_lookup(t2, hi):
        idx = (hi >> 16).astype(jnp.int32).reshape(-1, 8192)

        def chunk(carry, ix):
            oh = jax.nn.one_hot(ix, 65536, dtype=jnp.bfloat16)
            out = jnp.einsum("nv,vw->nw", oh, t2,
                             preferred_element_type=jnp.float32)
            return carry, (out[:, 0].astype(jnp.uint32) * 256
                           + out[:, 1].astype(jnp.uint32))

        _, res = jax.lax.scan(chunk, 0, idx)
        return res.reshape(-1)

    bin_mxu = jax.jit(mxu_lookup)
    dt_mxu_sub = timeit(bin_mxu, [t2, streams[0][:n_mxu]])
    dt_mxu = dt_mxu_sub * (n / n_mxu)  # scaled: rate is per-row
    print(f"5. bin_mxu  one-hot einsum      {n_mxu/dt_mxu_sub/1e6:8.1f}"
          f" Mrows/s  ({dt_mxu*1e3:7.1f} ms scaled, measured @{n_mxu:,})")

    dt_search = None
    if args.all:
        # measured 2026-08-17: jnp.searchsorted at C=24,412 over n=1e8
        # hung the remote Mosaic/XLA compile for >45 min without
        # producing a result — opt-in only.  bin_take subsumes its role
        # (same table, one gather instead of O(log C)).
        spl = jnp.asarray(np.quantile(host[0], np.arange(1, c) / c)
                          .astype(np.uint32))
        bin_search = jax.jit(lambda s, k: jnp.searchsorted(
            s, k, side="right").astype(jnp.uint32))
        dt_search = timeit(bin_search, [spl, streams[0]])
        print(f"6. bin_search C={c:<6d}         {n/dt_search/1e6:8.1f}"
              f" Mrows/s  ({dt_search*1e3:7.1f} ms)")

        spl1k = jnp.asarray(np.quantile(host[0], np.arange(1, 1024) / 1024)
                            .astype(np.uint32))
        bin_bcast = jax.jit(lambda s, k: jnp.sum(
            s[None, :] <= k[:, None], axis=1, dtype=jnp.int32))
        dt_bcast = timeit(bin_bcast, [spl1k, streams[0]])
        print(f"7. bin_bcast C=1024 (shipped)   {n/dt_bcast/1e6:8.1f}"
              f" Mrows/s  ({dt_bcast*1e3:7.1f} ms)")

    best_bin = min(d for d in (dt_take, dt_mxu, dt_search) if d is not None)
    est = best_bin + dt_mover + dt_clean
    print(f"\ncomposed: bin {best_bin*1e3:.1f} + mover {dt_mover*1e3:.1f}"
          f" + cleanup {dt_clean*1e3:.1f} = {est*1e3:.1f} ms"
          f" -> {n/est/1e6:.1f} Mrows/s  (full: {n/dt_full/1e6:.1f})")
    print("ATTACK VIABLE — implement it" if est < dt_full else
          "REFUTED: binned mover + cleanup cannot beat one lax.sort")

    # correctness of the composition at 4M (independent of speed)
    m = 4 * BLOCK * 64
    ks = [s[:m] for s in streams]
    bm = bin_take(table, ks[0])
    moved = mover(bm, *ks)
    fin = jax.jit(lambda b, *s: blocked_cleanup(b, s, m))(
        moved[0], *moved[1:])
    ref = full(*ks)
    ok = all(np.array_equal(np.asarray(a), np.asarray(r))
             for a, r in zip(fin[1:3], ref[:2]))
    print(f"e2e bin->mover->cleanup == full sort @ {m:,}: "
          f"{'OK' if ok else 'MISMATCH (segments likely > BLOCK/2)'}")


if __name__ == "__main__":
    main()
