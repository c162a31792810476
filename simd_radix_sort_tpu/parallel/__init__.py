"""Multi-chip / multi-host layer: distributed sort, operators, mesh helpers."""

from . import dist_ops, dist_sort, multihost  # noqa: F401
from .dist_sort import (  # noqa: F401
    distributed_sort,
    distributed_sort_multi,
    gather_result,
    gather_result_multi,
    make_mesh,
)
from .dist_ops import (  # noqa: F401
    distributed_filter,
    distributed_group_aggregate,
    distributed_join,
    distributed_top_k,
    distributed_unique,
    gather_filtered,
    gather_joined,
)
from .multihost import (hierarchical_group_aggregate, hierarchical_sort,  # noqa: F401
                        make_hierarchical_mesh)
