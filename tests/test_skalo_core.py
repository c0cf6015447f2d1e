"""C++ skalo core vs pure-python implementation: identical outputs.

The golden-fixture tests (test_skalo.py) run whichever core is active;
here both cores run on the same randomly generated multi-sample input and
every output file must match byte for byte.
"""

import os

import numpy as np
import pytest

from ska_tpu.api import build
from ska_tpu.sample import QualOpts


def _make_inputs(tmp_path, n_samples=4, L=20000, n_snps=20, seed=9):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = rng.choice(bases, size=L)
    ref_f = tmp_path / "ref.fa"
    with open(ref_f, "wb") as f:
        f.write(b">ref\n" + ref.tobytes() + b"\n")
    files = []
    for i in range(n_samples):
        g = ref.copy()
        pos = rng.choice(L, size=n_snps, replace=False)
        g[pos] = bases[
            (np.searchsorted(bases, g[pos]) + rng.integers(1, 4, n_snps)) % 4
        ]
        p = tmp_path / f"s{i}.fa"
        with open(p, "wb") as f:
            f.write(b">s%d\n" % i + g.tobytes() + b"\n")
        files.append((f"s{i}", str(p), None))
    return ref_f, files


@pytest.mark.parametrize("with_ref", [True, False])
@pytest.mark.parametrize("k", [31, 41, 63])
def test_native_matches_python(tmp_path, with_ref, k):
    from ska_tpu.skalo import SkaloConfig, run_skalo

    ref_f, files = _make_inputs(tmp_path)
    arr = build(files, k, True, QualOpts())

    outs = {}
    for mode in ("native", "python"):
        os.environ["SKA_SKALO_CORE"] = mode
        try:
            cfg = SkaloConfig(
                output_name=str(tmp_path / f"out_{mode}"),
                reference_genome=str(ref_f) if with_ref else None,
            )
            run_skalo(arr, cfg)
        finally:
            del os.environ["SKA_SKALO_CORE"]
        got = {}
        for suffix in ("_snps.fas", "_snps.vcf", "_indels.vcf", "_pseudo_genomes.fas"):
            p = tmp_path / f"out_{mode}{suffix}"
            got[suffix] = p.read_bytes() if p.exists() else None
        outs[mode] = got

    assert outs["native"] == outs["python"]
    # sanity: SNPs were actually found
    assert outs["native"]["_snps.fas"] is not None


@pytest.mark.parametrize("E1,E2", [(100, 200), (200, 100)])
def test_compact_graph_overlapping_chains(E1, E2):
    """compaction.rs:92-114 removes interior edges BY VALUE, so a bridge
    edge appended for one chain survives another (overlapping) chain's
    interior pass regardless of rewiring order. Scenario: E2 -> n2 where
    n2 sits mid-corridor of E1's chain n1->n2->n3->n4->X. Both extremity
    labelings are run so both set-iteration (= rewiring) orders are hit."""
    from ska_tpu.skalo.graph import compact_graph

    n1, n2, n3, n4, X = 1, 2, 3, 4, 300
    all_kmers = {
        E1: [n1],
        E2: [n2],
        n1: [n2],
        n2: [n3],
        n3: [n4],
        n4: [X],
    }
    compacted = compact_graph(all_kmers, {E1, E2}, {X})
    assert compacted == {n1: [n2, n3, n4], n2: [n3, n4]}
    # both chains bridge to X; interiors lose only their corridor edge
    assert all_kmers[n1] == [X]
    assert all_kmers[n2] == [X]
    assert all_kmers[n3] == []
    assert all_kmers[n4] == [X]


def test_native_matches_python_small_k_dense_snps(tmp_path):
    """k=7 regression: dense SNPs at tiny k produce paths whose entry node
    is also an exit extremity, so the reference's `vec_snps.push(i - 1)`
    wraps at i == 0 (read_graph.rs:205, usize in release mode) — the
    sentinel must never become a real SNP position (it previously made the
    C++ SNP stage read codes[-1] and fail the kmer_samples lookup), and
    the `i <= len - k_graph` bound must be vacuously true when the path is
    shorter than k_graph (read_graph.rs:200-202 wrap)."""
    from ska_tpu.skalo import SkaloConfig, run_skalo

    _, files = _make_inputs(tmp_path, n_samples=3, L=200, n_snps=30, seed=14)
    arr = build(files, 7, True, QualOpts())

    outs = {}
    for mode in ("native", "python"):
        os.environ["SKA_SKALO_CORE"] = mode
        try:
            cfg = SkaloConfig(output_name=str(tmp_path / f"sk_{mode}"))
            run_skalo(arr, cfg)
        finally:
            del os.environ["SKA_SKALO_CORE"]
        got = {}
        for suffix in ("_snps.fas", "_snps.vcf", "_indels.vcf", "_pseudo_genomes.fas"):
            p = tmp_path / f"sk_{mode}{suffix}"
            got[suffix] = p.read_bytes() if p.exists() else None
        outs[mode] = got

    assert outs["native"] == outs["python"]
    assert outs["native"]["_snps.fas"] is not None


def test_native_matches_python_two_mask_limbs(tmp_path):
    """S=66 samples: sample bitmasks span two uint64 limbs (M=2), covering
    MaskMap multi-limb hashing and the M>1 branch of the ks export."""
    from ska_tpu.skalo import SkaloConfig, run_skalo

    ref_f, files = _make_inputs(tmp_path, n_samples=66, L=800, n_snps=6, seed=3)
    arr = build(files, 31, True, QualOpts())

    outs = {}
    for mode in ("native", "python"):
        os.environ["SKA_SKALO_CORE"] = mode
        try:
            cfg = SkaloConfig(
                output_name=str(tmp_path / f"ml_{mode}"),
                reference_genome=str(ref_f),
            )
            run_skalo(arr, cfg)
        finally:
            del os.environ["SKA_SKALO_CORE"]
        got = {}
        for suffix in ("_snps.fas", "_snps.vcf", "_indels.vcf", "_pseudo_genomes.fas"):
            p = tmp_path / f"ml_{mode}{suffix}"
            got[suffix] = p.read_bytes() if p.exists() else None
        outs[mode] = got

    assert outs["native"] == outs["python"]
    assert outs["native"]["_snps.fas"] is not None

def test_native_thread_count_invariant(tmp_path):
    """SKA_THREADS must not change any output byte: the traversal pool
    fills per-entry result slots and concatenates in entry order, matching
    the reference's determinism discipline under rayon (read_graph.rs:41,
    tests/align.rs:349-397 run the suite at several thread counts)."""
    from ska_tpu.skalo import SkaloConfig, run_skalo

    ref_f, files = _make_inputs(tmp_path, n_samples=4, L=8000, n_snps=40, seed=21)
    arr = build(files, 31, True, QualOpts())

    outs = {}
    os.environ["SKA_SKALO_CORE"] = "native"
    try:
        for nt in ("1", "4"):
            os.environ["SKA_THREADS"] = nt
            try:
                cfg = SkaloConfig(
                    output_name=str(tmp_path / f"t{nt}"),
                    reference_genome=str(ref_f),
                )
                run_skalo(arr, cfg)
            finally:
                del os.environ["SKA_THREADS"]
            got = {}
            for suffix in (
                "_snps.fas", "_snps.vcf", "_indels.vcf", "_pseudo_genomes.fas"
            ):
                p = tmp_path / f"t{nt}{suffix}"
                got[suffix] = p.read_bytes() if p.exists() else None
            outs[nt] = got
    finally:
        del os.environ["SKA_SKALO_CORE"]

    assert outs["1"] == outs["4"]
    assert outs["1"]["_snps.fas"] is not None
