"""simd_radix_sort_tpu — a TPU-native vectorized sort & query-execution engine.

Brand-new JAX/XLA/Pallas framework with the capabilities of the reference
AVX-512 library jonicho/simd-radix-sort (see SURVEY.md): type-generic sort
with separate key and payload datastreams (int8..64, uint8..64, float32/64
keys via order-preserving bit transforms; arbitrary payload tuples; separate
SoA or combined AoS layout; ascending and descending), extended to a query
operator set (filter, hash aggregate, hash join) and multi-chip distributed
sort over `jax.sharding.Mesh`.
"""

from .config import SortConfig
from .methods import REGISTRY as SORT_METHODS
from .ops.sort import (
    argsort,
    pack_rows,
    sort,
    sort_batched,
    sort_multi,
    sort_packed,
    sort_with_payloads,
    unpack_rows,
)
from .utils import common, transforms
from .utils.transforms import from_sortable, sort_np, to_sortable

__all__ = [
    "SortConfig",
    "SORT_METHODS",
    "sort",
    "argsort",
    "sort_batched",
    "sort_multi",
    "sort_with_payloads",
    "sort_packed",
    "pack_rows",
    "unpack_rows",
    "to_sortable",
    "from_sortable",
    "sort_np",
    "common",
    "transforms",
]

__version__ = "0.2.0"
