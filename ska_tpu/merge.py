"""Multi-sample merge: sorted-key-array union replacing hashmap merging.

The reference merges per-sample hashmaps with a rayon binary tree
(src/merge_ska_dict.rs:354-417). Here each sample is already a sorted
key array, so the k-way merge is concat + sort + segment boundaries +
scatter of per-sample middle-base columns — deterministic and
mesh-shardable (see ska_tpu.parallel for the multi-device version).
"""

from typing import List

import numpy as np

from .array import SkaArray
from .encoding import SET_TO_ASCII
from .ops import npkeys as K
from .sampletypes import SampleDict


def merge_samples(samples: List[SampleDict]) -> SkaArray:
    """Merge per-sample dictionaries into an array (rows sorted by key).

    Equivalent to MergeSkaDict::append/merge + MergeSkaArray::new
    (merge_ska_dict.rs:77-151, merge_ska_array.rs:166-186); missing
    entries become b'-'.
    """
    if not samples:
        raise ValueError("No samples to merge")
    k = samples[0].k
    rc = samples[0].rc
    for s in samples[1:]:
        if s.k != k:
            raise ValueError(f"K-mer lengths do not match: {s.k} {k}")
        if s.rc != rc:
            raise ValueError("Strand use inconsistent")
    n_samples = len(samples)
    names = [s.name for s in samples]

    all_keys = np.concatenate([s.keys for s in samples], axis=0)
    all_sets = np.concatenate([s.sets for s in samples], axis=0)
    all_sidx = np.concatenate(
        [np.full(s.ksize, i, dtype=np.int32) for i, s in enumerate(samples)]
    )

    order = K.np_lex_argsort(all_keys)
    skeys = all_keys[order]
    ssets = all_sets[order]
    ssidx = all_sidx[order]

    if len(skeys) == 0:
        raise ValueError("No split k-mers found")
    first = np.ones(len(skeys), dtype=bool)
    first[1:] = np.any(skeys[1:] != skeys[:-1], axis=-1)
    ids = np.cumsum(first) - 1
    n_rows = int(ids[-1]) + 1

    variants = np.full((n_rows, n_samples), ord("-"), dtype=np.uint8)
    variants[ids, ssidx] = SET_TO_ASCII[ssets]
    counts = np.bincount(ids, minlength=n_rows).astype(np.int64)

    ukeys = skeys[first]
    return SkaArray(k=k, rc=rc, names=names, keys=ukeys, variants=variants, counts=counts)


def _sorted_rows(a: SkaArray):
    """(keys, variants) with rows in lexicographic key order; no copy when
    already sorted (the common case for arrays built by this framework)."""
    keys = a.keys
    if keys.shape[0] > 1:
        if keys.shape[1] == 1:
            flat = keys[:, 0]
            is_sorted = bool(np.all(flat[1:] >= flat[:-1]))
        else:
            from .array import _combine128

            comb = _combine128(keys)
            is_sorted = bool(np.all(comb[1:] >= comb[:-1]))
        if not is_sorted:
            order = K.np_lex_argsort(keys)
            return keys[order], a.variants[order]
    return keys, a.variants


def extend_arrays(arrays: List[SkaArray]) -> SkaArray:
    """`ska merge`: union of k-mers, concatenated sample columns
    (reference MergeSkaDict::extend, merge_ska_dict.rs:160-193).

    Arrays built by this framework are key-sorted, so the union is a
    linear B-way merge (csrc/merge_batches.cpp) — no host sort ever
    touches the full union. Arrays loaded from reference-written `.skf`
    files keep the file's hashmap row order (io/skf.py preserves it), so
    any unsorted input is per-array sorted first; the numpy lexsort below
    is the no-toolchain fallback."""
    if not arrays:
        raise ValueError("No .skf files to merge")
    k = arrays[0].k
    rc = arrays[0].rc
    for a in arrays[1:]:
        if a.k != k:
            raise ValueError(f"K-mer lengths do not match: {a.k} {k}")
        if a.rc != rc:
            raise ValueError("Strand use inconsistent")
    names = [n for a in arrays for n in a.names]
    n_samples = len(names)

    try:
        from .io import native
    except Exception:  # pragma: no cover - no toolchain
        native = None
    if native is not None:
        pairs = [_sorted_rows(a) for a in arrays]
        ukeys, variants, counts = native.merge_batches(
            [p[0] for p in pairs], [p[1] for p in pairs]
        )
        return SkaArray(
            k=k, rc=rc, names=names, keys=ukeys, variants=variants, counts=counts
        )

    all_keys = np.concatenate([a.keys for a in arrays], axis=0)
    order = K.np_lex_argsort(all_keys)
    skeys = all_keys[order]
    first = np.ones(len(skeys), dtype=bool)
    first[1:] = np.any(skeys[1:] != skeys[:-1], axis=-1)
    ukeys = skeys[first]
    row_of = np.cumsum(first) - 1  # row for each sorted input row
    n_rows = int(row_of[-1]) + 1 if len(row_of) else 0

    variants = np.full((n_rows, n_samples), ord("-"), dtype=np.uint8)
    col = 0
    off = 0
    # scatter each array's rows into the union rows
    inv = np.empty(len(all_keys), dtype=np.int64)
    inv[order] = row_of
    for a in arrays:
        rows = inv[off : off + a.ksize]
        variants[rows, col : col + a.nsamples] = a.variants
        off += a.ksize
        col += a.nsamples

    counts = (variants != ord("-")).sum(axis=1).astype(np.int64)
    return SkaArray(k=k, rc=rc, names=names, keys=ukeys, variants=variants, counts=counts)
