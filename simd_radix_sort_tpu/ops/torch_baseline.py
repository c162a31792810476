"""External comparison baseline: torch.sort (CPU).

Parity with the reference's vendored third-party baselines
(/root/reference/src/sort_methods.hpp:246-347 — STLSort, IPPRadix,
BramasSort, BlacherSort): an engine we do not control, driven through the
same method interface so the harness can produce comparison rows.  torch is
CPU-only in this image, so like `seq`/`quick` it is a host baseline
(device=False in the registry).

torch has no unsigned >8-bit dtypes, so keys are routed through the
order-preserving transforms to an unsigned carrier and then bit-flipped to
the signed dtype of the same width (sign-bit XOR preserves order between
unsigned and two's-complement signed); payloads are reordered with the
returned permutation.
"""

from __future__ import annotations

import numpy as np

from ..utils import transforms

_SIGNED = {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}


def sort_np(keys: np.ndarray, *payloads: np.ndarray, ascending: bool = True):
    """Sort with torch.sort on the host; reference-equivalent ordering."""
    import torch

    keys = np.asarray(keys)
    u = transforms.to_sortable_np(keys, ascending)
    nbits = u.dtype.itemsize * 8
    signed = (u ^ u.dtype.type(1 << (nbits - 1))).view(_SIGNED[u.dtype.itemsize])
    vals, idx = torch.sort(torch.from_numpy(signed), stable=False)
    u_sorted = (vals.numpy().view(u.dtype)) ^ u.dtype.type(1 << (nbits - 1))
    keys_out = transforms.from_sortable_np(u_sorted, keys.dtype, ascending)
    perm = idx.numpy()
    return (keys_out, *[np.asarray(p)[perm] for p in payloads])
