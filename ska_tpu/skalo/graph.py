"""Colored De Bruijn graph construction, extremity detection, compaction.

Mirrors reference src/skalo/input.rs, extremities.rs and compaction.rs.
Graph: dict node-(k-1)-mer -> list of successor (k-1)-mers (edge multiset,
duplicates preserved exactly as the reference's Vec). Sample sets: int
bitmasks keyed by full k-mer.
"""

import logging
from typing import Dict, List, Set, Tuple

from .kmer_utils import DEGENERATE, rev_comp_int

log = logging.getLogger("ska_tpu.skalo")


def build_graph(ska_array):
    """input.rs:18-125: expand degenerate middle bases, add fwd + rc edges,
    record per-full-k-mer sample bitmasks (first insert wins)."""
    sample_names = list(ska_array.names)
    len_kmer = ska_array.k
    h = (len_kmer - 1) // 2

    all_kmers: Dict[int, List[int]] = {}
    kmer_samples: Dict[int, int] = {}

    keys = ska_array.keys
    W = keys.shape[1]
    variants = ska_array.variants
    mask_km1 = (1 << (2 * (len_kmer - 1))) - 1

    for r in range(ska_array.ksize):
        if W == 1:
            key_int = int(keys[r, 0])
        else:
            key_int = (int(keys[r, 0]) << 64) | int(keys[r, 1])
        upper = key_int >> (2 * h)
        lower = key_int & ((1 << (2 * h)) - 1)

        # middle char -> sample bitmask, in deterministic A/C/G/T-expansion
        middle_2_samples: Dict[str, int] = {}
        row = variants[r]
        for i in range(len(row)):
            nucl = chr(row[i])
            if nucl == "-":
                continue
            for new_nucl in DEGENERATE[nucl]:
                middle_2_samples[new_nucl] = middle_2_samples.get(new_nucl, 0) | (1 << i)

        for nucl, bitmask in middle_2_samples.items():
            mid_code = (ord(nucl) >> 1) & 3
            full = (upper << (2 * (h + 1))) | (mid_code << (2 * h)) | lower
            k1 = full >> 2  # first k-1 bases
            k2 = full & mask_km1  # last k-1 bases

            all_kmers.setdefault(k1, []).append(k2)
            rc2 = rev_comp_int(k2, len_kmer - 1)
            rc1 = rev_comp_int(k1, len_kmer - 1)
            all_kmers.setdefault(rc2, []).append(rc1)

            kmer_samples.setdefault(full, bitmask)
            kmer_samples.setdefault(rev_comp_int(full, len_kmer), bitmask)

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

    # modify graph (compaction.rs:92-114)
    for starting_kmer, vec_visited in compacted.items():
        first = vec_visited[0]
        all_kmers[starting_kmer] = [n for n in all_kmers[starting_kmer] if n != first]
        for a, b in zip(vec_visited[:-2], vec_visited[1:-1]):
            all_kmers[a] = [n for n in all_kmers[a] if n != b]
        all_kmers.setdefault(starting_kmer, []).append(vec_visited[-1])
        vec_visited.pop()

    return compacted
