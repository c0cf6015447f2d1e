"""`ska lo` (skalo): colored De Bruijn graph SNP/indel recovery.

Counterpart of reference src/skalo/ (8 files): builds a (k-1)-mer graph
from the split k-mer array with per-full-k-mer sample sets, finds bubble
entry/exit nodes, compacts unbranched chains, walks bubbles to bounded
depth, and calls SNPs/indels with optional positioning on a reference
genome. K-mers are python ints (k <= 63 fits in 126 bits); sample sets
are int bitmasks.

This round the traversal runs on host (graph sizes in the reference's
test workloads are tiny); the batched on-device walk kernel is the
planned next optimization (SURVEY.md section 7, hard part #2).
"""

from dataclasses import dataclass
from typing import Optional


@dataclass
class SkaloConfig:
    """Reference skalo::utils::Config (utils.rs:8-27)."""

    output_name: str
    max_missing: float = 0.1
    max_depth: int = 4
    max_indel_kmers: int = 2
    reference_genome: Optional[str] = None


def run_skalo(ska_array, config: SkaloConfig):
    """Orchestration, mirroring generic_modes.rs:286-306.

    By default the graph core (extremities, compaction, bubble DFS) runs
    in C++ (csrc/skalo_core.cpp); SKA_SKALO_CORE=python forces the pure
    python implementation (also the fallback without a native toolchain).
    """
    import os

    use_native = os.environ.get("SKA_SKALO_CORE", "native") != "python"
    if use_native:
        try:
            from .core import run_core
            from .traverse import split_and_analyse

            len_kmer, sample_names, built_groups, kmer_samples, paths = run_core(
                ska_array, config
            )
            split_and_analyse(
                built_groups, kmer_samples, config, len_kmer - 1, sample_names,
                path_store=paths,
            )
            return
        except ImportError:
            pass  # no toolchain: python fallback below

    from .graph import build_graph, identify_good_kmers
    from .traverse import build_variant_groups

    len_kmer, sample_names, all_kmers, kmer_samples = build_graph(ska_array)
    k_graph = len_kmer - 1

    start_kmers, end_kmers = identify_good_kmers(all_kmers, kmer_samples, k_graph)

    build_variant_groups(
        all_kmers,
        start_kmers,
        end_kmers,
        kmer_samples,
        config,
        k_graph,
        sample_names,
    )
