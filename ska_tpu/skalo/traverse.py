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

    for kmer in start_kmers:
        tmp_container: Dict[int, List[List[int]]] = {}

        for starting_kmer in all_kmers.get(kmer, []):
            visited = {kmer, starting_kmer}
            vec_visited = [kmer, starting_kmer]
            if starting_kmer in compacted:
                vec_visited = vec_visited + compacted[starting_kmer]

            stack = [(starting_kmer, visited, vec_visited, 0)]
            while stack:
                current_kmer, visited, vec_visited, depth = stack.pop()
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
                        vec_visited.append(nxt)
                        current_kmer = nxt
                        if nxt in compacted:
                            vec_visited.extend(compacted[nxt])
                        if nxt in end_kmers:
                            tmp_container.setdefault(nxt, []).append(list(vec_visited))
                    elif len(good_next) > 1:
                        for nxt in good_next:
                            new_visited = set(visited)
                            new_visited.add(nxt)
                            new_vec = list(vec_visited)
                            new_vec.append(nxt)
                            if nxt in compacted:
                                new_vec.extend(compacted[nxt])
                            if nxt in end_kmers:
                                tmp_container.setdefault(nxt, []).append(list(new_vec))
                            stack.append((nxt, new_visited, new_vec, depth + 1))
                        walking = False
                    else:
                        walking = False

        if any(len(v) > 1 for v in tmp_container.values()):
            for exit_kmer, vec_variants in tmp_container.items():
                # paths must start and end on a difference (read_graph.rs:166-172)
                second_set = {v[1] for v in vec_variants}
                second_to_last_set = {v[-2] for v in vec_variants}
                if len(second_set) > 1 and len(second_to_last_set) > 1:
                    mcl = most_abundant_length(vec_variants)
                    if mcl is None:
                        continue
                    if len(vec_variants) == 2:
                        filtered = vec_variants
                    else:
                        filtered = [v for v in vec_variants if len(v) == mcl]

                    for vec_visited in filtered:
                        seq_parts = [decode_int(kmer, k_graph)]
                        vec_snps: List[int] = []
                        n = len(vec_visited)
                        for i, nxt in enumerate(vec_visited):
                            if i != 0:
                                seq_parts.append(last_nucl(nxt))
                            if nxt in start_kmers and i <= n - k_graph:
                                vec_snps.append(i + k_graph)
                            elif nxt in end_kmers:
                                # i == 0 here would underflow in the
                                # reference (debug panic); cannot occur
                                vec_snps.append(i - 1)
                        variant = VariantInfo("".join(seq_parts), vec_snps)
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
