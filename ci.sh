#!/usr/bin/env bash
# CI recipe: native build + test suite + entry compile checks.
# The reference's CI surface is its Makefile (reference Makefile:1-28);
# this is the TPU framework's equivalent one-command gate.
#
#   ./ci.sh              full gate (everything below, full test suite)
#   ./ci.sh --quick      <2-min smoke tier: pytest -m "not slow"
#                        (engine/type/direction matrix + one distributed
#                        smoke file; drops fuzz sweeps and wide grids)
#   ./ci.sh --multiproc  additionally run the REAL multi-process DCN leg
#                        (scripts/multiproc_cpu.py --all: 2p/4p + uneven
#                        error path; ~2-3 min, opt-in)
set -euo pipefail
cd "$(dirname "$0")"

QUICK=0
MULTIPROC=0
for arg in "$@"; do
  case "$arg" in
    --quick) QUICK=1 ;;
    --multiproc) MULTIPROC=1 ;;
    *) echo "unknown flag: $arg" >&2; exit 2 ;;
  esac
done

echo "== native harness build =="
make -C native

echo "== install check =="
# --no-build-isolation: CI hosts are offline; setuptools is baked in
python -m pip install -e . --quiet --no-deps --no-build-isolation

echo "== lint (if ruff available) =="
if command -v ruff >/dev/null 2>&1; then
  ruff check simd_radix_sort_tpu tests scripts
else
  python -m pyflakes simd_radix_sort_tpu 2>/dev/null || \
    echo "  (ruff/pyflakes not installed; skipping lint)"
fi

if [ "$QUICK" = 1 ]; then
  echo "== smoke tests (quick tier, 8-device virtual CPU mesh) =="
  python -m pytest tests/ -q -m "not slow"
else
  echo "== unit + matrix tests (8-device virtual CPU mesh) =="
  python -m pytest tests/ -q
fi

echo "== golden A/B vs the compiled reference (sampled) =="
# byte-compares our output against the actual reference binary
# (/root/reference/radixSort.hpp, AVX-512) on a CI-sized subset; the
# full matrix is scripts/golden_reference.py -> GOLDEN_r03.json
if [ -r /root/reference/radixSort.hpp ] && command -v g++ >/dev/null; then
  python scripts/golden_reference.py --sample
else
  echo "  (reference header or g++ unavailable; skipping golden sample)"
fi

echo "== driver entry compile checks =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print('entry: OK')
g.dryrun_multichip(8)
"

if [ "$MULTIPROC" = 1 ]; then
  echo "== real multi-process DCN leg (2p/4p + uneven error path) =="
  python scripts/multiproc_cpu.py --all
fi

echo "CI: all green"
