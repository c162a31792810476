"""Performance models: HBM roofline for sort/operator passes.

The reference publishes ns/element on one x86 core (BASELINE.md); the
TPU-native engine's ceiling is HBM bandwidth (SURVEY.md section 7 step 3:
"Measure vs HBM roofline (target >=70%)").  These models predict that
ceiling so benchmarks can report utilization.
"""

from __future__ import annotations

import dataclasses

import jax


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float          # HBM bandwidth, GB/s
    bf16_tflops: float       # MXU peak
    vmem_mb: float


# Public figures for common TPU generations.
CHIPS = {
    "v4": ChipSpec("v4", 1228.0, 275.0, 128.0),
    "v5e": ChipSpec("v5e", 819.0, 197.0, 128.0),
    "v5p": ChipSpec("v5p", 2765.0, 459.0, 128.0),
    "v6e": ChipSpec("v6e", 1640.0, 918.0, 128.0),
}


def current_chip() -> ChipSpec:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for key, spec in CHIPS.items():
        if key in kind.replace(" ", "").replace("lite", "e"):
            return spec
    if "v5" in kind:
        return CHIPS["v5e"]
    return CHIPS["v5e"]


def radix_sort_roofline_rows_per_s(row_bytes: int, key_bits: int,
                                   digit_bits: int = 8,
                                   chip: ChipSpec | None = None) -> float:
    """Rows/s upper bound for an LSD radix sort that streams every row
    read+write once per digit pass (histogram reads amortized into the
    same pass)."""
    chip = chip or current_chip()
    passes = (key_bits + digit_bits - 1) // digit_bits
    bytes_per_row = passes * row_bytes * 2  # read + write per pass
    return chip.hbm_gbps * 1e9 / bytes_per_row


def stream_roofline_rows_per_s(row_bytes: int, num_passes: float = 1.0,
                               chip: ChipSpec | None = None) -> float:
    """Rows/s bound for an operator that streams rows num_passes times
    (filter = 1 read + selectivity-weighted write ~= 1.x passes, etc.)."""
    chip = chip or current_chip()
    return chip.hbm_gbps * 1e9 / (row_bytes * 2 * num_passes)
