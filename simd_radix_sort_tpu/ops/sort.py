"""Public sort API: separate key/payload datastreams and combined layout.

Mirrors the reference's two entry points (/root/reference/src/radix_sort.hpp:297-337
and README usage):

  * separate streams:  sort(keys, payload_a, payload_b, ..., ascending=...)
  * combined layout:   sort_packed(packed_bytes, key_dtype, payload_dtypes, ...)

Both are functional (return new arrays) — the TPU idiom replacing the
reference's in-place writes; the produced ordering is identical.  The sort is
NOT stable by default, matching the reference (SURVEY.md section 2.2); pass
stable=True for a stable variant (a capability the reference does not have).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import common, transforms
from . import xla_sort


_check_64bit_ok = common.check_64bit_ok


def sort(keys, *payloads, ascending: bool | None = None,
         method: str | None = None, stable: bool | None = None,
         block_threshold: int | None = None, digit_bits: int | None = None,
         config=None):
    """Sort keys with any number of payload streams kept in lock-step.

    Equivalent of simd_sort::radix_sort::sort(num, keys, payloads...)
    (/root/reference/radixSort.hpp:1761-1783).  Accepts jax or numpy arrays;
    returns (sorted_keys,) + sorted payload tuple (or just sorted_keys when
    there are no payloads, for convenience).

    `config` (a SortConfig) supplies defaults for every knob — the runtime
    analogue of the reference's policy templates (sort_methods.hpp:24,100);
    explicit keyword arguments override it per call.
    """
    from .. import methods  # local import to avoid cycle
    from ..config import SortConfig

    cfg = config if config is not None else SortConfig()
    ascending = cfg.ascending if ascending is None else ascending
    method = cfg.method if method is None else method
    stable = cfg.stable if stable is None else stable
    block_threshold = (cfg.block_threshold if block_threshold is None
                       else block_threshold)
    digit_bits = cfg.digit_bits if digit_bits is None else digit_bits

    # float64 must NEVER live on a TPU device: this stack emulates f64
    # storage lossily (NaN payloads / low mantissa bits are not preserved)
    # and cannot lower bitcast-convert FROM f64 at all.  All f64 streams
    # (keys and payloads) therefore cross the device boundary as raw uint64
    # bits, reinterpreted on the host on the way out; such outputs are
    # returned as NumPy float64 arrays.
    lossy_f64 = jax.default_backend() != "cpu"

    def _to_device(x):
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
        # check BEFORE jnp.asarray: with x64 disabled jax silently
        # downcasts 64-bit inputs, which would corrupt keys/payloads
        _check_64bit_ok(x.dtype)
        if lossy_f64 and np.dtype(x.dtype) == np.float64:
            return jnp.asarray(np.asarray(x).view(np.uint64)), np.dtype(np.float64)
        return jnp.asarray(x), None

    keys, key_dtype = _to_device(keys)
    pl = [_to_device(p) for p in payloads]
    payloads = tuple(p for p, _ in pl)
    pl_f64 = [dt for _, dt in pl]
    if keys.ndim != 1:
        raise ValueError("keys must be 1-D")
    for p in payloads:
        if p.shape != keys.shape:
            raise ValueError("payload streams must match keys shape")

    m = methods.resolve(method, key_dtype or keys.dtype,
                        tuple(dt or p.dtype for p, dt in pl), keys.shape[0])
    keys_out, payloads_out = m.run(
        keys, payloads, ascending=ascending, stable=stable,
        block_threshold=block_threshold, digit_bits=digit_bits,
        key_dtype=key_dtype)

    if key_dtype is not None:
        keys_out = np.asarray(keys_out).view(np.float64)
    payloads_out = tuple(
        np.asarray(p).view(np.float64) if dt is not None else p
        for p, dt in zip(payloads_out, pl_f64))
    if not payloads:
        return keys_out
    return (keys_out,) + tuple(payloads_out)


def sort_with_payloads(keys, payloads, **kw):
    """Like `sort` but always returns (keys, tuple_of_payloads)."""
    out = sort(keys, *payloads, **kw)
    if not payloads:
        return out, ()
    return out[0], tuple(out[1:])


# ---------------------------------------------------------------------------
# Combined (AoS) layout — DataElement<K, Ps...> equivalent
# ---------------------------------------------------------------------------
#
# The reference reinterprets a DataElement<K,Ps...>* as a wide integer lane
# type and partitions whole elements by key bits (src/radix_sort.hpp:314-332).
# The TPU-native equivalent keeps the packed row-major byte matrix
# (n, element_size) uint8 and sorts rows by the key reconstructed from its
# leading bytes, carrying every byte column as a lock-step operand.


def pack_rows(keys: np.ndarray, payloads) -> np.ndarray:
    """convertToSingleArray equivalent (src/data.hpp:332-346): pack key +
    payload streams into an (n, element_size) uint8 AoS matrix, key bytes
    first (little-endian), payloads in declaration order."""
    keys = np.asarray(keys)
    cols = [np.ascontiguousarray(keys).view(np.uint8)
            .reshape(len(keys), keys.dtype.itemsize)]
    for p in payloads:
        p = np.ascontiguousarray(np.asarray(p))
        cols.append(p.view(np.uint8).reshape(len(p), p.dtype.itemsize))
    return np.concatenate(cols, axis=1)


def unpack_rows(packed: np.ndarray, key_dtype, payload_dtypes):
    """setFromSingleArray equivalent (src/data.hpp:348-361)."""
    packed = np.ascontiguousarray(np.asarray(packed, dtype=np.uint8))
    key_dtype = np.dtype(key_dtype)
    out = []
    off = 0
    for dtype in (key_dtype,) + tuple(np.dtype(d) for d in payload_dtypes):
        w = dtype.itemsize
        col = np.ascontiguousarray(packed[:, off:off + w])
        out.append(col.reshape(-1).view(dtype))
        off += w
    if off != packed.shape[1]:
        raise ValueError("element size mismatch")
    return out[0], tuple(out[1:])


def _key_from_byte_columns(byte_cols, key_dtype):
    """Reconstruct the key's unsigned carrier from its little-endian byte
    columns using 32-bit lane math only."""
    key_dtype = np.dtype(key_dtype)
    w = key_dtype.itemsize
    words = []
    for word_idx in range((w + 3) // 4):
        nb = min(4, w - word_idx * 4)
        word = jnp.zeros_like(byte_cols[0], dtype=jnp.uint32)
        for b in range(nb):
            word = word | (
                byte_cols[word_idx * 4 + b].astype(jnp.uint32)
                << jnp.uint32(8 * b)
            )
        words.append(word)
    return words  # little-endian list of uint32 words


def sort_packed(packed, key_dtype, ascending: bool = True,
                stable: bool = False, method: str | None = None,
                block_threshold: int | None = None,
                digit_bits: int | None = None, config=None):
    """Sort an (n, element_size) uint8 combined-layout matrix by the key in
    each row's leading bytes.  Jittable; equivalent of
    radix_sort::sort(num, DataElement<K,Ps...>*) (src/radix_sort.hpp:314-332).

    Unlike the reference there is no power-of-two element-size restriction.

    Routes through the same method facade as `sort()` (round-5: packed rows
    previously hardcoded the variadic-lax.sort path): `method`/`config`
    select the engine exactly like `sort(method=...)`, with the packed
    payload words acting as the payload streams.  Device engines keep this
    jittable; host engines (seq/torch/cpp/quickseq) work outside jit only.
    """
    from .. import methods  # local import to avoid cycle
    from ..config import SortConfig

    cfg = config if config is not None else SortConfig()
    method = cfg.method if method is None else method
    block_threshold = (cfg.block_threshold if block_threshold is None
                       else block_threshold)
    digit_bits = cfg.digit_bits if digit_bits is None else digit_bits

    key_dtype = np.dtype(key_dtype)
    packed = jnp.asarray(packed, dtype=jnp.uint8)
    n, esize = packed.shape
    if esize < key_dtype.itemsize:
        raise ValueError("element size smaller than key size")

    byte_cols = [packed[:, i] for i in range(esize)]
    words = _key_from_byte_columns(byte_cols[: key_dtype.itemsize], key_dtype)

    # Raw key bits (unsigned, little-endian) from the leading bytes.
    if key_dtype.itemsize == 8:
        bits = transforms.merge64(words[1], words[0])
    else:
        bits = words[0].astype(common.unsigned_of(key_dtype))
    # f64 keys follow the lossy-f64 protocol (see sort()): the engine sees
    # u64 bits + key_dtype marker instead of a device float64 array.
    lossy_f64 = key_dtype == np.float64 and jax.default_backend() != "cpu"
    if lossy_f64:
        keys_arr, kmark = bits, np.dtype(np.float64)
    elif key_dtype.kind == "u":
        keys_arr, kmark = bits, None
    else:
        keys_arr = jax.lax.bitcast_convert_type(bits, key_dtype)
        kmark = None

    # Only the PAYLOAD bytes travel as data operands.  The order transform is
    # a bijection, so the sorted key bytes are recovered from the sorted
    # keys post-sort — carrying the raw key bytes through the sort as well
    # (as through round 3) duplicated them and cost, measured on TPU,
    # exactly the extra operand bytes: 8 u32 operands instead of 6 for the
    # 24-byte north-star config-3 row (COMBINED_1E8_r04.json, 2.0x the
    # [u64,u64] headline for 2.0x the operand bytes).
    #
    # Payload bytes travel packed into u32 words (4 byte-columns per
    # operand), not as per-byte u8 operands: TPU lanes are 32-bit, so byte
    # operands waste 4x the compare-exchange bandwidth.
    ksize = key_dtype.itemsize
    payload_cols = byte_cols[ksize:]
    full = len(payload_cols) // 4
    word_cols = []
    for w in range(full):
        b = payload_cols[4 * w: 4 * w + 4]
        word_cols.append(
            b[0].astype(jnp.uint32)
            | (b[1].astype(jnp.uint32) << 8)
            | (b[2].astype(jnp.uint32) << 16)
            | (b[3].astype(jnp.uint32) << 24))
    tail_cols = payload_cols[4 * full:]
    pseudo_pl = tuple(word_cols) + tuple(tail_cols)

    m = methods.resolve(method, kmark or key_dtype,
                        tuple(p.dtype for p in pseudo_pl), n)
    keys_out, pays_out = m.run(
        keys_arr, pseudo_pl, ascending=ascending, stable=stable,
        block_threshold=block_threshold, digit_bits=digit_bits,
        key_dtype=kmark)

    # Sorted key bytes back from the sorted keys (32-bit lane math only).
    if kmark is not None or key_dtype.kind == "u":
        kbits = jnp.asarray(keys_out)  # already raw unsigned bits
    else:
        kbits = jax.lax.bitcast_convert_type(
            jnp.asarray(keys_out), common.unsigned_of(key_dtype))
    if ksize == 8:
        khi, klo = transforms.split64(kbits)
        kwords = [klo, khi]
    else:
        kwords = [kbits.astype(jnp.uint32)]
    cols = [(kwords[i // 4] >> jnp.uint32(8 * (i % 4))).astype(jnp.uint8)
            for i in range(ksize)]
    sorted_words = pays_out[:full]
    sorted_tail = pays_out[full:]
    for w in sorted_words:
        w = jnp.asarray(w)
        for shift in (0, 8, 16, 24):
            cols.append((w >> jnp.uint32(shift)).astype(jnp.uint8))
    cols.extend(jnp.asarray(t) for t in sorted_tail)
    return jnp.stack(cols, axis=1)


def _stage_keys_host(keys):
    """Shared front-end staging: 64-bit guard + lossy-f64 bits routing
    (same rules as sort()).  Returns (device_keys, key_dtype_or_None)."""
    if not isinstance(keys, jax.Array):
        keys = np.asarray(keys)
    _check_64bit_ok(keys.dtype)
    if jax.default_backend() != "cpu" and np.dtype(keys.dtype) == np.float64:
        return jnp.asarray(np.asarray(keys).view(np.uint64)), np.float64
    return jnp.asarray(keys), None


def sort_multi(keys_columns, *payloads, ascending=True, stable: bool = False):
    """Composite (multi-column) lexicographic sort: order rows by the
    first key column, ties by the second, and so on — the ORDER BY of the
    query-operator set.  Not in the reference (single key type per sort);
    it falls out of the variadic-carrier architecture: each column's
    order-preserving words simply concatenate into one lax.sort key list.

    `keys_columns` is a tuple of 1-D arrays (any mix of supported key
    dtypes); `ascending` is one bool or a per-column tuple.  Returns
    (sorted_key_columns_tuple, sorted_payloads_tuple).  Host-level entry
    (like sort()): stages host arrays, guards 64-bit mode, and routes
    f64 columns AND payloads through the bits protocol — f64 streams
    come back as NumPy float64 arrays.
    """
    keys_columns = tuple(keys_columns)
    if not keys_columns:
        raise ValueError("sort_multi needs at least one key column")
    if isinstance(ascending, bool):
        ascending = (ascending,) * len(keys_columns)
    if len(ascending) != len(keys_columns):
        raise ValueError("one ascending flag per key column")

    staged = [_stage_keys_host(k) for k in keys_columns]
    kops_per_col = []
    for (kd, kdt), up in zip(staged, ascending):
        kops_per_col.append(transforms.key_operands(kd, up, kdt))
    all_kops = tuple(w for ops in kops_per_col for w in ops)
    # payloads get the SAME staging as keys: 64-bit guard + f64-as-bits
    # (f64 must never live on a TPU device — see sort())
    pays_staged = [_stage_keys_host(p) for p in payloads]
    pays = tuple(p for p, _ in pays_staged)

    out = jax.lax.sort(all_kops + pays, num_keys=len(all_kops),
                       is_stable=stable)
    cols_out = []
    i = 0
    for (kd, kdt), up, ops in zip(staged, ascending, kops_per_col):
        words = out[i: i + len(ops)]
        i += len(ops)
        col = transforms.keys_from_operands(
            tuple(words), kdt or kd.dtype, up, as_bits=kdt is not None)
        if kdt is not None:  # f64 bits back to host float64
            col = np.asarray(col).view(np.float64)
        cols_out.append(col)
    pays_out = tuple(
        np.asarray(p).view(np.float64) if dt is not None else p
        for p, (_, dt) in zip(out[i:], pays_staged))
    return tuple(cols_out), pays_out


def argsort(keys, ascending: bool = True, stable: bool = True):
    """Permutation that sorts `keys` — int32 indices.  Jittable.

    Not in the reference (it sorts in place), but the natural companion
    operator; uses the same order-preserving transforms."""
    keys, key_dtype = _stage_keys_host(keys)
    return xla_sort.argsort_keys(keys, ascending=ascending, stable=stable,
                                 key_dtype=key_dtype)


def sort_batched(keys, *payloads, ascending: bool = True,
                 stable: bool = False):
    """Sort each ROW of 2-D arrays independently (keys and payloads in
    lock-step along axis 1).  This is the engine's fastest shape on TPU —
    batched row sorts stay VMEM-resident (BENCH_NOTES.md) — exposed
    directly for block-sorted / segment workloads.  f64 keys are supported
    on CPU only (use sort() per row or u64 bit views on TPU)."""
    if not isinstance(keys, jax.Array):
        keys = np.asarray(keys)
    _check_64bit_ok(keys.dtype)
    if (jax.default_backend() != "cpu"
            and np.dtype(keys.dtype) == np.float64):
        raise ValueError("sort_batched does not support float64 on TPU "
                         "(lossy device storage); view as uint64 bits")
    keys = jnp.asarray(keys)
    if keys.ndim != 2:
        raise ValueError("sort_batched expects 2-D keys")
    kops = transforms.key_operands(keys, ascending)
    out = jax.lax.sort(tuple(kops) + tuple(jnp.asarray(p) for p in payloads),
                       dimension=1, num_keys=len(kops), is_stable=stable)
    keys_out = transforms.keys_from_operands(out[: len(kops)], keys.dtype,
                                             ascending)
    if not payloads:
        return keys_out
    return (keys_out,) + tuple(out[len(kops):])
