"""Typed configuration for the sort engine.

TPU-native replacement for the reference's compile-time policy templates
(`BitSorter` / `CmpSorter` / `Partitioner` / `Up` / `Combined` template
parameters, /root/reference/src/sort_methods.hpp:24,100, and the runtime
`cmpSortThreshold` argument, src/radix_sort.hpp:297-312).
"""

from __future__ import annotations

import dataclasses

# Reference default: cmpSortThreshold = 16 (src/radix_sort.hpp:334-337).
# On TPU the analogous knob is the block size below which a partition stops
# recursing and a vectorized rank/bitonic block sorter finishes the tile.
DEFAULT_BLOCK_THRESHOLD = 1024

# 8-bit digits: one TPU histogram+scatter pass replaces 8 of the reference's
# 1-bit compress-store passes (SURVEY.md section 7).
DEFAULT_DIGIT_BITS = 8


@dataclasses.dataclass(frozen=True)
class SortConfig:
    ascending: bool = True
    method: str = "auto"  # key into methods.REGISTRY
    stable: bool = False  # reference sort is NOT stable (SURVEY.md section 2.2)
    block_threshold: int = DEFAULT_BLOCK_THRESHOLD
    digit_bits: int = DEFAULT_DIGIT_BITS
