"""Bubble traversal and variant-group construction
(reference src/skalo/read_graph.rs)."""

import logging
from collections import Counter
from dataclasses import dataclass
from typing import Dict, List, Tuple

from .graph import compact_graph
from .kmer_utils import LazySeq, decode_int, last_nucl

log = logging.getLogger("ska_tpu.skalo")


@dataclass(slots=True)
class VariantInfo:
    """utils.rs:57-70: a path's sequence plus candidate SNP positions.

    `idx` is the path's row in the native traversal core's master buffers
    (core.PathStore), letting the C++ SNP stage read sequences/snps with
    no per-group marshaling; -1 for paths built by the python core."""

    sequence: str
    vec_snps: List[int]
    idx: int = -1


def most_abundant_length(vec_variants):
    """read_graph.rs:275-288 (ties: first encountered, deterministically)."""
    counts = Counter(len(v) for v in vec_variants)
    return max(counts.items(), key=lambda kv: kv[1])[0] if counts else None


_entry_decode_cache: Dict[int, str] = {}


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
        return (path, chain, path[2] + len(chain), prev, chain[-1])

    # compacted chains are shared by many paths: freeze them as tuples and
    # precompute each chain's 2-bit codes and extremity marks ONCE, so a
    # kept path decodes by walking its ~10 segments with offset arithmetic
    # instead of per-node numpy/set work (1.85M kept paths at genome scale)
    for ck in compacted:
        compacted[ck] = tuple(compacted[ck])

    import numpy as np

    seg_cache: Dict[int, tuple] = {}

    def _seg_info(payload):
        info = seg_cache.get(id(payload))
        if info is None:
            if k_graph <= 32:
                codes = (np.array(payload, dtype=np.uint64) & np.uint64(3)).astype(
                    np.uint8
                )
            else:  # node ints exceed uint64 for k_graph > 32
                codes = np.fromiter(
                    (v & 3 for v in payload), np.uint8, count=len(payload)
                )
            marks = [
                (rel, v in start_kmers, v in end_kmers)
                for rel, v in enumerate(payload)
                if v in start_kmers or v in end_kmers
            ]
            info = (codes, marks)
            if len(payload) > 2:  # only chains repeat; keep cache bounded
                seg_cache[id(payload)] = info
        return info

    def _decode_cons(path, entry):
        """VariantInfo from a cons path (read_graph.rs:197-220 semantics)."""
        segs = []
        n = path[2]
        while path is not None:
            segs.append(path[1])
            path = path[0]
        segs.reverse()
        parts = []
        vec_snps: List[int] = []
        off = 0
        cutoff = n - k_graph
        for p in segs:
            codes, marks = _seg_info(p)
            parts.append(codes)
            for rel, in_s, in_e in marks:
                i = off + rel
                # reference: i <= vec_visited.len() - k_graph in usize
                # (read_graph.rs:200-202); when n < k_graph the release-mode
                # subtraction wraps and the bound is vacuously true
                if in_s and (cutoff < 0 or i <= cutoff):
                    vec_snps.append(i + k_graph)
                elif in_e:
                    vec_snps.append(i - 1)
            off += len(p)
        head = _entry_decode_cache.get(entry)
        if head is None:
            head = decode_int(entry, k_graph)
            _entry_decode_cache[entry] = head
        return VariantInfo(LazySeq(head, parts=parts, n=n), vec_snps)

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
                        filtered = [p for p, _ in recs]
                    else:
                        filtered = [p for p, _ in recs if p[2] == mcl]

                    for p in filtered:
                        built_groups.setdefault((kmer, exit_kmer), []).append(
                            _decode_cons(p, kmer)
                        )

    log.info("%d variant groups", len(built_groups))
    split_and_analyse(built_groups, kmer_samples, config, k_graph, sample_names)


def split_and_analyse(
    built_groups, kmer_samples, config, k_graph, sample_names, path_store=None
):
    """Indel split (read_graph.rs:236-262) + SNP/indel analysis."""
    log.info("Identifying indels")

    min_indel = 2 * k_graph
    final_groups: Dict[Tuple[int, int], List[VariantInfo]] = {}
    final_indels: Dict[Tuple[int, int], List[VariantInfo]] = {}

    for ext, vec_variant in built_groups.items():
        if len(vec_variant) < 2:
            continue
        # GroupPaths exposes lengths without materializing VariantInfos
        lens = getattr(vec_variant, "lengths", None)
        if lens is None:
            lens = [len(v.sequence) for v in vec_variant]
        if len(vec_variant) == 2 and lens[0] != lens[1]:
            if lens[0] <= min_indel or lens[1] <= min_indel:
                final_indels[ext] = vec_variant
        else:
            final_groups[ext] = vec_variant

    from .variants import analyse_variant_groups

    analyse_variant_groups(
        final_groups, final_indels, kmer_samples, config, k_graph, sample_names,
        path_store=path_store,
    )
