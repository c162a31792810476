"""Multi-chip / multi-host layer: distributed sort, operators, mesh helpers."""

from . import dist_ops, dist_sort, multihost  # noqa: F401
from .dist_sort import distributed_sort, gather_result, make_mesh  # noqa: F401
from .dist_ops import (  # noqa: F401
    distributed_filter,
    distributed_group_aggregate,
    distributed_top_k,
    gather_filtered,
)
