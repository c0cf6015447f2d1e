"""Colored De Bruijn graph construction, extremity detection, compaction.

Mirrors reference src/skalo/input.rs, extremities.rs and compaction.rs.
Graph: dict node-(k-1)-mer -> list of successor (k-1)-mers (edge multiset,
duplicates preserved exactly as the reference's Vec). Sample sets: int
bitmasks keyed by full k-mer.
"""

import logging
import sys
from typing import Dict, List, Set, Tuple

from .kmer_utils import DEGENERATE, rev_comp_int

log = logging.getLogger("ska_tpu.skalo")


def _expand_arrays(ska_array):
    """Vectorized per-(row, middle-base) expansion (input.rs:18-125).

    Returns (len_kmer, sample_names, W, arrs, mo): arrs maps
    {k1,k2,rc1,rc2,full,rcf} to flattened (hi|None, lo) uint64 arrays in
    exactly the scalar formulation's insertion order (row-major; within a
    row, bases ordered by their first contributing sample, tie-broken by
    position in that sample's DEGENERATE expansion); mo is the (m, M)
    uint64 sample-bitmask limbs per expansion.
    """
    import numpy as np

    from .kmer_utils import shl2, shr2

    sample_names = list(ska_array.names)
    len_kmer = ska_array.k
    h = (len_kmer - 1) // 2

    keys = np.asarray(ska_array.keys, dtype=np.uint64)
    W = keys.shape[1]
    v = np.asarray(ska_array.variants)
    n, S = v.shape

    # per-(ascii char, base slot) expansion tables; slots follow "ACGT"
    BASES = "ACGT"
    T = np.zeros((256, 4), bool)
    TPOS = np.full((256, 4), 9, np.int8)
    for ch, lst in DEGENERATE.items():
        for pos, b in enumerate(lst):
            bi = BASES.index(b)
            T[ord(ch), bi] = True
            TPOS[ord(ch), bi] = pos

    contrib = T[v]  # (n, S, 4)
    valid = contrib.any(axis=1)  # (n, 4)
    M = (S + 63) // 64
    # sample bitmasks via packbits: bit i of byte i//8 is sample i
    # (bitorder little), then a zero-padded byte view reads as uint64
    # limbs — one C pass instead of S strided-slice copies
    pb = np.packbits(contrib, axis=1, bitorder="little")  # (n, ceil(S/8), 4)
    mbuf = np.zeros((n, 4, M * 8), np.uint8)
    mbuf[:, :, : pb.shape[1]] = pb.transpose(0, 2, 1)
    masks = mbuf.view(np.uint64)  # (n, 4, M)
    if sys.byteorder != "little":  # pragma: no cover - no BE host here
        masks = masks.byteswap()

    # insertion order of middle_2_samples: first contributing sample index,
    # tie-broken by position in that sample's DEGENERATE list. argmax on
    # the bool view = index of the first True (S sentinel when none),
    # without materializing a (n, 4, S) int array
    first_i = contrib.transpose(0, 2, 1).argmax(axis=2).astype(np.int32)
    first_i[~valid] = S
    fchar = v[np.arange(n)[:, None], np.clip(first_i, 0, S - 1)]
    fpos = TPOS[fchar, np.arange(4)[None, :]].astype(np.int32)
    # stable argsort of the 4 slots by (first_i, fpos): a 5-exchange
    # sorting network over keys made unique with the lane index — ties
    # resolve by lane ascending, exactly np.argsort(..., kind="stable"),
    # at a fraction of its cost on (n, 4)
    key4 = (first_i * np.int32(16) + fpos) * np.int32(4) + np.arange(
        4, dtype=np.int32
    )
    a, b, c, d = key4[:, 0], key4[:, 1], key4[:, 2], key4[:, 3]
    a, b = np.minimum(a, b), np.maximum(a, b)
    c, d = np.minimum(c, d), np.maximum(c, d)
    a, c = np.minimum(a, c), np.maximum(a, c)
    b, d = np.minimum(b, d), np.maximum(b, d)
    b, c = np.minimum(b, c), np.maximum(b, c)
    order = np.empty((n, 4), np.int32)
    np.bitwise_and(a, np.int32(3), out=order[:, 0])
    np.bitwise_and(b, np.int32(3), out=order[:, 1])
    np.bitwise_and(c, np.int32(3), out=order[:, 2])
    np.bitwise_and(d, np.int32(3), out=order[:, 3])

    codes = np.array([(ord(c) >> 1) & 3 for c in BASES], dtype=np.uint64)

    # Derived-plane algebra (saves three full-width rev-comp passes over
    # (n, 4) arrays — the old formulation dominated this function):
    #   full = base | (code << 2h), with base and code in disjoint bits,
    #   and _rev64 is linear over OR of disjoint bit groups, so
    #   rcf = ((_rev64(base) | _rev64(code << 2h)) ^ C) >> (w - 2k).
    #   k1 = full >> 2 keeps the FIRST k-1 bases, whose revcomp is the
    #   LAST k-1 bases of rcf: rc1 = rcf & mask_{k-1}; symmetrically
    #   k2 = full & mask keeps the last k-1 bases and rc2 = rcf >> 2.
    from .kmer_utils import _COMP, _rev64_np

    # flatten (row, slot) in insertion order, valid slots only, BEFORE the
    # plane algebra: with m = valid (row, base) pairs ~ n, every derived
    # plane is one m-sized op instead of an (n, 4) materialization plus
    # its own take_along_axis gather (the old formulation's cost center)
    idt = np.int32 if 4 * n < 2**31 else np.int64
    gidx = (np.arange(n, dtype=idt)[:, None] * idt(4) + order).ravel()
    spos = gidx[valid.ravel()[gidx]]  # selected flat (row*4 + slot)
    rows = spos >> 2
    slots = spos & 3

    if W == 1:
        key = keys[:, 0]
        upper = key >> np.uint64(2 * h)
        lower = key & np.uint64((1 << (2 * h)) - 1)
        base = (upper << np.uint64(2 * (h + 1))) | lower
        code_sh = codes << np.uint64(2 * h)  # (4,)
        rb = _rev64_np(base)
        rcodes = _rev64_np(code_sh)
        full = base[rows] | code_sh[slots]
        rcf = ((rb[rows] | rcodes[slots]) ^ _COMP) >> np.uint64(
            64 - 2 * len_kmer
        )
        kmask = np.uint64((1 << (2 * (len_kmer - 1))) - 1)
        arrs = {
            "k1": (None, full >> np.uint64(2)),
            "k2": (None, full & kmask),
            "rc1": (None, rcf & kmask),
            "rc2": (None, rcf >> np.uint64(2)),
            "full": (None, full),
            "rcf": (None, rcf),
        }
    else:
        hi, lo = keys[:, 0], keys[:, 1]
        uh, ul = shr2(hi, lo, 2 * h)
        lmask = (1 << (2 * h)) - 1
        ll = lo & np.uint64(lmask & 0xFFFFFFFFFFFFFFFF)
        lh = hi & np.uint64((lmask >> 64) & 0xFFFFFFFFFFFFFFFF)
        bh0, bl0 = shl2(uh, ul, 2 * (h + 1))
        bh, bl = bh0 | lh, bl0 | ll  # base (n,)
        ch_, cl_ = shl2(np.zeros(4, np.uint64), codes.copy(), 2 * h)  # (4,)
        # 128-bit reverse of base and of the code contribution (un-XORed)
        rbh, rbl = _rev64_np(bl), _rev64_np(bh)
        rch, rcl = _rev64_np(cl_), _rev64_np(ch_)
        fh = bh[rows] | ch_[slots]
        fl = bl[rows] | cl_[slots]
        rfh, rfl = shr2(
            (rbh[rows] | rch[slots]) ^ _COMP,
            (rbl[rows] | rcl[slots]) ^ _COMP,
            128 - 2 * len_kmer,
        )
        kmask = (1 << (2 * (len_kmer - 1))) - 1
        kml = np.uint64(kmask & 0xFFFFFFFFFFFFFFFF)
        kmh = np.uint64((kmask >> 64) & 0xFFFFFFFFFFFFFFFF)
        arrs = {
            "k1": shr2(fh, fl, 2),
            "k2": (fh & kmh, fl & kml),
            "rc1": (rfh & kmh, rfl & kml),
            "rc2": shr2(rfh, rfl, 2),
            "full": (fh, fl),
            "rcf": (rfh, rfl),
        }

    mo = masks.reshape(n * 4, M)[spos]
    return len_kmer, sample_names, W, arrs, mo


def _mask_list(mo):
    import numpy as np

    M = mo.shape[1]
    if M == 1:
        return mo[:, 0].tolist()
    acc = mo[:, 0].astype(object)
    for j in range(1, M):
        acc |= mo[:, j].astype(object) << (64 * j)
    return acc.tolist()


def build_graph(ska_array):
    """input.rs:18-125: expand degenerate middle bases, add fwd + rc edges,
    record per-full-k-mer sample bitmasks (first insert wins). Expansion is
    vectorized (_expand_arrays); a flat python loop fills the dicts in the
    same insertion order, which downstream traversal depends on."""
    from .kmer_utils import to_obj_ints

    len_kmer, sample_names, W, arrs, mo = _expand_arrays(ska_array)
    lists = {name: to_obj_ints(*p) for name, p in arrs.items()}
    mask_list = _mask_list(mo)

    all_kmers: Dict[int, List[int]] = {}
    kmer_samples: Dict[int, int] = {}
    ak = all_kmers.setdefault
    ks = kmer_samples.setdefault
    for a, b, ra, rb, f, rf, m in zip(
        lists["k1"], lists["k2"], lists["rc1"], lists["rc2"],
        lists["full"], lists["rcf"], mask_list,
    ):
        ak(a, []).append(b)
        ak(rb, []).append(ra)
        ks(f, m)
        ks(rf, m)

    log.info("%d nodes", len(all_kmers))
    return len_kmer, sample_names, all_kmers, kmer_samples


def identify_good_kmers(all_kmers, kmer_samples, k_graph):
    """extremities.rs:10-51: entry nodes have >=2 out-edges whose full-k-mer
    sample sets differ; exits are their reverse complements."""
    start_kmers: Set[int] = set()
    end_kmers: Set[int] = set()

    for kmer, next_kmers in all_kmers.items():
        if len(next_kmers) > 1:
            done = False
            for i in range(len(next_kmers)):
                if done:
                    break
                for j in range(i + 1, len(next_kmers)):
                    full1 = (kmer << 2) | (next_kmers[i] & 3)
                    full2 = (kmer << 2) | (next_kmers[j] & 3)
                    if kmer_samples[full1] != kmer_samples[full2]:
                        start_kmers.add(kmer)
                        end_kmers.add(rev_comp_int(kmer, k_graph))
                        done = True
                        break

    if not start_kmers:
        raise SystemExit(
            "Error: there is no entry node in this graph, hence no variant.\n"
        )
    log.info("%d entry nodes", len(start_kmers))
    return start_kmers, end_kmers


def compact_graph(all_kmers, start_kmers, end_kmers):
    """compaction.rs:10-117: collapse unbranched chains between extremity
    nodes; rewire edges; return removed chains keyed by their first node."""
    compacted: Dict[int, List[int]] = {}

    def walk_from(kmer):
        starting_kmers = all_kmers.get(kmer)
        if starting_kmers is None:
            return
        for starting_kmer in list(starting_kmers):
            current = starting_kmer
            visited = set()
            vec_visited: List[int] = []
            while True:
                nxt = all_kmers.get(current)
                if nxt is not None and len(nxt) == 1 and nxt[0] not in visited:
                    current = nxt[0]
                    vec_visited.append(current)
                    visited.add(current)
                    if current in end_kmers or current in start_kmers:
                        break
                else:
                    break
            if len(vec_visited) > 1:
                compacted[starting_kmer] = vec_visited

    for kmer in start_kmers:
        walk_from(kmer)
    for kmer in end_kmers:
        walk_from(kmer)

    # modify graph (compaction.rs:92-114). Removal must be BY VALUE, not a
    # wholesale clear: a chain's starting node can itself sit mid-corridor
    # of a longer overlapping chain, and a bridge edge appended for one
    # chain must survive the other chain's interior pass regardless of
    # rewiring order (retain(neighbor != window[1]) in the reference).
    for starting_kmer, vec_visited in compacted.items():
        first = vec_visited[0]
        all_kmers[starting_kmer] = [n for n in all_kmers[starting_kmer] if n != first]
        for a, b in zip(vec_visited[:-2], vec_visited[1:-1]):
            all_kmers[a] = [n for n in all_kmers[a] if n != b]
        all_kmers.setdefault(starting_kmer, []).append(vec_visited[-1])
        vec_visited.pop()

    return compacted
