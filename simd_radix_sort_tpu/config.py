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

# 16-bit digits: the committed knob sweep (bench_out/digits-int32-int32-
# Uniform-262144.dat: 4->11.75, 8->6.39, 16->3.49, 32->3.99 ns/elem) shows
# the stable-sort mover's pass cost is digit-width independent, so wider
# digits (fewer passes) win until the digit itself stops fitting a native
# 32-bit lane comparison.  Matches the engine default (ops/radix.py).
DEFAULT_DIGIT_BITS = 16


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
    digit_bits       — LSD digit width for the radix engine.
    """

    ascending: bool = True
    method: str = "auto"  # key into methods.REGISTRY
    stable: bool = False
    block_threshold: int | None = DEFAULT_BLOCK_THRESHOLD
    digit_bits: int = DEFAULT_DIGIT_BITS
