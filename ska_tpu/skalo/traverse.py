"""Bubble traversal and variant-group construction
(reference src/skalo/read_graph.rs)."""

import logging
from collections import Counter
from dataclasses import dataclass
from typing import Dict, List, Tuple

from .graph import compact_graph
from .kmer_utils import decode_int, last_nucl

log = logging.getLogger("ska_tpu.skalo")


@dataclass
class VariantInfo:
    """utils.rs:57-70: a path's sequence plus candidate SNP positions."""

    sequence: str
    vec_snps: List[int]


def most_abundant_length(vec_variants):
    """read_graph.rs:275-288 (ties: first encountered, deterministically)."""
    counts = Counter(len(v) for v in vec_variants)
    return max(counts.items(), key=lambda kv: kv[1])[0] if counts else None


_DEC_BYTES = None


def _decode_path(vec_visited, entry, k_graph, start_kmers, end_kmers, start_arr, end_arr):
    """VariantInfo for one kept path (read_graph.rs:197-220 semantics):
    sequence = decode(entry) + last base of every later node; snp
    candidates at start-node visits (within range) else end-node visits.
    Vectorized with numpy for k_graph <= 32; scalar fallback otherwise."""
    import numpy as np

    global _DEC_BYTES
    n = len(vec_visited)
    if start_arr is None:
        seq_parts = [decode_int(entry, k_graph)]
        vec_snps: List[int] = []
        for i, nxt in enumerate(vec_visited):
            if i != 0:
                seq_parts.append(last_nucl(nxt))
            if nxt in start_kmers and i <= n - k_graph:
                vec_snps.append(i + k_graph)
            elif nxt in end_kmers:
                vec_snps.append(i - 1)
        return VariantInfo("".join(seq_parts), vec_snps)

    if _DEC_BYTES is None:
        _DEC_BYTES = np.frombuffer(b"ACTG", dtype=np.uint8)
    arr = np.array(vec_visited, dtype=np.uint64)
    tail = _DEC_BYTES[(arr[1:] & np.uint64(3)).astype(np.intp)]
    seq = decode_int(entry, k_graph) + tail.tobytes().decode()

    idx = np.arange(n)
    in_start = start_arr[np.searchsorted(start_arr, arr) % len(start_arr)] == arr
    in_end = end_arr[np.searchsorted(end_arr, arr) % len(end_arr)] == arr
    a = in_start & (idx <= n - k_graph)
    b = (~a) & in_end
    vals = np.where(a, idx + k_graph, idx - 1)
    vec_snps = vals[a | b].tolist()
    return VariantInfo(seq, vec_snps)


def build_variant_groups(
    all_kmers, start_kmers, end_kmers, kmer_samples, config, k_graph, sample_names
):
    """read_graph.rs:19-272: DFS with explicit stack from each entry node,
    bounded branching depth; group paths by (entry, exit); keep the most
    common path length unless exactly 2 paths; split off indels."""
    log.info("Compacting graph")
    compacted = compact_graph(all_kmers, start_kmers, end_kmers)

    log.info("Traversing graph")
    built_groups: Dict[Tuple[int, int], List[VariantInfo]] = {}

    if k_graph <= 32:
        import numpy as np

        start_arr = np.sort(np.fromiter(start_kmers, dtype=np.uint64, count=len(start_kmers)))
        end_arr = np.sort(np.fromiter(end_kmers, dtype=np.uint64, count=len(end_kmers)))
    else:
        start_arr = end_arr = None

    # Paths are immutable cons chains: (parent, payload_tuple, length,
    # second_to_last, last). Appends and branch forks are O(1) instead of
    # O(path length) list copies (paths span corridors of thousands of
    # nodes); only paths in surviving groups are materialized. Semantics
    # and ordering are identical to the literal list formulation.
    def _append(path, item):
        return (path, (item,), path[2] + 1, path[4], item)

    def _extend(path, chain):
        if not chain:
            return path
        prev = chain[-2] if len(chain) >= 2 else path[4]
        return (path, tuple(chain), path[2] + len(chain), prev, chain[-1])

    def _flatten(path):
        parts = []
        while path is not None:
            parts.append(path[1])
            path = path[0]
        out = []
        for p in reversed(parts):
            out.extend(p)
        return out

    for kmer in start_kmers:
        tmp_container: Dict[int, List[tuple]] = {}

        for starting_kmer in all_kmers.get(kmer, []):
            visited = {kmer, starting_kmer}
            path = (None, (kmer, starting_kmer), 2, kmer, starting_kmer)
            if starting_kmer in compacted:
                path = _extend(path, compacted[starting_kmer])

            stack = [(starting_kmer, visited, path, 0)]
            while stack:
                current_kmer, visited, path, depth = stack.pop()
                if depth > config.max_depth:
                    continue

                walking = True
                while walking:
                    good_next = [
                        k2
                        for k2 in all_kmers.get(current_kmer, [])
                        if k2 not in visited
                    ]
                    if len(good_next) == 1:
                        nxt = good_next[0]
                        visited.add(nxt)
                        path = _append(path, nxt)
                        current_kmer = nxt
                        if nxt in compacted:
                            path = _extend(path, compacted[nxt])
                        if nxt in end_kmers:
                            tmp_container.setdefault(nxt, []).append(
                                (path, starting_kmer)
                            )
                    elif len(good_next) > 1:
                        for nxt in good_next:
                            new_visited = set(visited)
                            new_visited.add(nxt)
                            new_path = _append(path, nxt)
                            if nxt in compacted:
                                new_path = _extend(new_path, compacted[nxt])
                            if nxt in end_kmers:
                                tmp_container.setdefault(nxt, []).append(
                                    (new_path, starting_kmer)
                                )
                            stack.append((nxt, new_visited, new_path, depth + 1))
                        walking = False
                    else:
                        walking = False

        if any(len(v) > 1 for v in tmp_container.values()):
            for exit_kmer, recs in tmp_container.items():
                # paths must start and end on a difference (read_graph.rs:166-172)
                second_set = {second for _, second in recs}
                second_to_last_set = {p[3] for p, _ in recs}
                if len(second_set) > 1 and len(second_to_last_set) > 1:
                    lengths = [p[2] for p, _ in recs]
                    counts = Counter(lengths)
                    mcl = max(counts.items(), key=lambda kv: kv[1])[0] if counts else None
                    if mcl is None:
                        continue
                    if len(recs) == 2:
                        filtered = [_flatten(p) for p, _ in recs]
                    else:
                        filtered = [_flatten(p) for p, _ in recs if p[2] == mcl]

                    for vec_visited in filtered:
                        variant = _decode_path(
                            vec_visited, kmer, k_graph, start_kmers, end_kmers,
                            start_arr, end_arr,
                        )
                        built_groups.setdefault((kmer, exit_kmer), []).append(variant)

    log.info("%d variant groups", len(built_groups))
    log.info("Identifying indels")

    min_indel = 2 * k_graph
    final_groups: Dict[Tuple[int, int], List[VariantInfo]] = {}
    final_indels: Dict[Tuple[int, int], List[VariantInfo]] = {}

    for ext, vec_variant in built_groups.items():
        if len(vec_variant) < 2:
            continue
        if len(vec_variant) == 2 and len(vec_variant[0].sequence) != len(
            vec_variant[1].sequence
        ):
            if any(len(v.sequence) <= min_indel for v in vec_variant):
                final_indels[ext] = vec_variant
        else:
            final_groups[ext] = vec_variant

    from .variants import analyse_variant_groups

    analyse_variant_groups(
        final_groups, final_indels, kmer_samples, config, k_graph, sample_names
    )
