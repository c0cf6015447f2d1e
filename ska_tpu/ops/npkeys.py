"""Numpy-only packed-key helpers (no jax import).

Split out of ops.keys so the host-native command paths (SkaArray
filters, .skf codec, merge bookkeeping) can handle (N, W) uint64 key
limbs without pulling in the accelerator runtime. ops.keys re-exports
these, so device code keeps its single `K` namespace.
"""

import numpy as np


def width_for_k(k: int) -> int:
    """Limb count for split k-mer keys: 2*(k-1) bits."""
    return 1 if k <= 31 else 2


def kbits_for_k(k: int) -> int:
    """64 or 128, as stored in .skf k_bits (reference lib.rs:592-622)."""
    return 64 * width_for_k(k)


def to_python_ints(keys_np) -> list:
    """(N, W) or (N,) numpy uint64 -> python ints (for CBOR encoding)."""
    keys_np = np.asarray(keys_np, dtype=np.uint64)
    if keys_np.ndim == 1:
        return [int(x) for x in keys_np]
    if keys_np.shape[-1] == 1:
        return [int(x) for x in keys_np[:, 0]]
    return [(int(h) << 64) | int(l) for h, l in keys_np]


def from_python_ints(vals, W) -> np.ndarray:
    """Python ints -> (N, W) numpy uint64 limbs (hi, lo)."""
    n = len(vals)
    out = np.zeros((n, W), dtype=np.uint64)
    if W == 1:
        for i, v in enumerate(vals):
            out[i, 0] = v
    else:
        for i, v in enumerate(vals):
            out[i, 0] = (v >> 64) & 0xFFFFFFFFFFFFFFFF
            out[i, 1] = v & 0xFFFFFFFFFFFFFFFF
    return out


def np_lex_argsort(keys_np):
    """Host lexicographic argsort of (N, W) uint64 keys."""
    keys_np = np.asarray(keys_np)
    if keys_np.ndim == 1:
        keys_np = keys_np[:, None]
    cols = [keys_np[:, i] for i in range(keys_np.shape[1] - 1, -1, -1)]
    return np.lexsort(cols)


def np_lex_is_sorted(keys_np) -> bool:
    """True iff (N, W) uint64 keys are lexicographically non-decreasing.

    One vectorized pass (~10 ms at 4M rows) that lets sorted_view skip
    its O(N log N) argsort: this framework's .skf writer always stores
    keys sorted (the merge pipeline is sort-based), so loads hit this
    fast path; reference-written files fall back to the argsort.
    """
    keys_np = np.asarray(keys_np)
    if keys_np.ndim == 1:
        keys_np = keys_np[:, None]
    if keys_np.shape[0] <= 1:
        return True
    a, b = keys_np[:-1], keys_np[1:]
    if keys_np.shape[1] == 1:
        return bool(np.all(a[:, 0] <= b[:, 0]))
    # general lexicographic check over any limb count: rows compare <=
    # iff at the first differing limb a < b (widths today are 1 or 2,
    # but a silent wrong True here would corrupt sorted_view lookups)
    lt = a[:, 0] < b[:, 0]
    eq = a[:, 0] == b[:, 0]
    for w in range(1, keys_np.shape[1] - 1):
        lt |= eq & (a[:, w] < b[:, w])
        eq &= a[:, w] == b[:, w]
    last = keys_np.shape[1] - 1
    return bool(np.all(lt | (eq & (a[:, last] <= b[:, last]))))
