"""Comparison-sort engine method built on XLA's variadic sort.

This is the framework's always-correct baseline path (SURVEY.md section 7,
step 2): keys are bit-transformed to unsigned carriers (utils/transforms.py),
64-bit carriers split into (hi, lo) uint32 so comparisons run on native TPU
lanes, and payload streams ride along as non-key operands of
`jax.lax.sort(..., num_keys=k)` — the TPU-native analogue of the reference's
separate key/payload datastreams (/root/reference/src/radix_sort.hpp:297-312),
where each payload stream is compress-stored in lock-step with the key vector.

XLA lowers this to its fully vectorized on-chip sort; it plays the same role
in our method registry that the comparison-sorter family (quick_sort.hpp,
cmp_sorters.hpp) plays in the reference's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import transforms


def sort_arrays(keys: jax.Array, payloads, ascending: bool = True, stable: bool = False,
                key_dtype=None):
    """Sort `keys` (1-D) and reorder each payload stream in lock-step.

    Returns (sorted_keys, tuple_of_sorted_payloads).  Functional (out-of-place)
    — the TPU idiom replacing the reference's in-place semantics; output
    ordering matches exactly (SURVEY.md section 7 "semantics, not memory
    strategy, is what must match").  Payload streams are never inspected by
    the comparator (lax.sort compares only the first num_keys operands), so
    they ride along in their native dtype — the analogue of the reference's
    opaque payload compress-stores (src/simd.hpp:310-389).
    """
    kops = transforms.key_operands(keys, ascending, key_dtype)
    out = jax.lax.sort(
        tuple(kops) + tuple(payloads), num_keys=len(kops), is_stable=stable
    )
    keys_out = transforms.keys_from_operands(
        out[: len(kops)], key_dtype or keys.dtype, ascending,
        as_bits=key_dtype is not None,
    )
    return keys_out, tuple(out[len(kops):])


def argsort_keys(keys: jax.Array, ascending: bool = True, stable: bool = True,
                 key_dtype=None):
    """Return the permutation that sorts `keys` (stable by default)."""
    n = keys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    kops = transforms.key_operands(keys, ascending, key_dtype)
    out = jax.lax.sort(
        tuple(kops) + (iota,), num_keys=len(kops), is_stable=stable
    )
    return out[-1]
