"""Multi-host (multi-slice / DCN) entry helpers.

The reference is single-process by construction (SURVEY.md section 2.11);
this module is the scale-out shell around dist_sort: initialize the JAX
distributed runtime, build a mesh whose inner axis rides ICI and outer axis
rides DCN, and run the same `distributed_sort_sharded` — XLA routes the
ragged_all_to_all hierarchically over the mesh.

Single-host virtual testing: `XLA_FLAGS=--xla_force_host_platform_device_count=N`
with backend cpu exercises identical program structure (tests/, and the
driver's dryrun_multichip).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

from . import dist_sort


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op when already initialized or when
    running single-process).  On Cloud TPU pods the arguments are inferred
    from the environment; elsewhere pass them explicitly."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_hierarchical_mesh(ici_axis: str = "x", dcn_axis: str = "slice"
                           ) -> Mesh:
    """Mesh with hosts/slices on the outer (DCN) axis and each slice's
    chips on the inner (ICI) axis, so the heavy per-bucket exchange of
    dist_sort stays on ICI within a slice and only bucket-boundary traffic
    crosses DCN."""
    devs = np.array(jax.devices())
    num_procs = jax.process_count()
    if num_procs > 1 and len(devs) % num_procs == 0:
        grid = devs.reshape(num_procs, -1)
        return Mesh(grid, (dcn_axis, ici_axis))
    return Mesh(devs.reshape(1, -1), (dcn_axis, ici_axis))


def distributed_sort_multihost(keys, *payloads, ici_axis: str = "x",
                               dcn_axis: str = "slice", **kw):
    """Sort across all processes' devices over ONE flattened logical axis.

    Devices are ordered slice-major (each slice's chips contiguous on the
    axis), so key-adjacent buckets land on ICI neighbours and only the
    bucket ranges straddling slice boundaries cross DCN; the exchange
    itself is still a single flat ragged_all_to_all — a true two-phase
    (per-slice sort, then cross-slice merge over `dcn_axis`) that bounds
    DCN traffic to one pass is future work.  `make_hierarchical_mesh` is
    provided for callers composing their own 2-D shardings."""
    mesh2 = make_hierarchical_mesh(ici_axis, dcn_axis)
    flat = Mesh(mesh2.devices.reshape(-1), (ici_axis,))
    return dist_sort.distributed_sort(keys, *payloads, mesh=flat,
                                      axis=ici_axis, **kw)
