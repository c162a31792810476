"""Typed configuration for the sort engine.

TPU-native replacement for the reference's compile-time policy templates
(`BitSorter` / `CmpSorter` / `Partitioner` / `Up` / `Combined` template
parameters, /root/reference/src/sort_methods.hpp:24,100, and the runtime
`cmpSortThreshold` argument, src/radix_sort.hpp:297-312).

A `SortConfig` is consumed by `ops.sort.sort(..., config=...)`: it supplies
defaults for every runtime knob, with explicit keyword arguments taking
precedence (the analogue of overriding a template default at a call site).
`methods.resolve` also accepts one to drive method selection.
"""

from __future__ import annotations

import dataclasses

# Reference default: cmpSortThreshold = 16 (src/radix_sort.hpp:334-337).
# On TPU the analogous knob is the block size below which a partition stops
# recursing and a vectorized block sorter finishes the tile; each engine
# carries its own measured default (16 for the host quick model matching the
# reference, 1024-row blocks for the device engines).
DEFAULT_BLOCK_THRESHOLD = None

# None = per-key-width engine default: the knob sweeps (bench_out/
# digits-*.dat) show the stable-sort mover's pass cost is digit-width
# independent, so fewer passes win — 16-bit digits for <=32-bit keys,
# full 32-bit word digits for 64-bit carriers (ops/radix.py).
DEFAULT_DIGIT_BITS = None


@dataclasses.dataclass(frozen=True)
class SortConfig:
    """Runtime sort policy; every field maps to a `sort()` keyword.

    ascending        — the reference's `Up` template parameter.
    method           — key into methods.REGISTRY ("auto" = static policy).
    stable           — reference sort is NOT stable (SURVEY.md section 2.2);
                       True requests the strictly stronger ordering.
    block_threshold  — cmpSortThreshold analogue (base-case block size for
                       the quick engine's splitter recursion); None keeps
                       each engine's own default.
    digit_bits       — LSD digit width for the radix engine; None keeps
                       the measured per-key-width default.
    """

    ascending: bool = True
    method: str = "auto"  # key into methods.REGISTRY
    stable: bool = False
    block_threshold: int | None = DEFAULT_BLOCK_THRESHOLD
    digit_bits: int | None = DEFAULT_DIGIT_BITS
