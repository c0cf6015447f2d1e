"""Native host-mode build engine (csrc/host_build.cpp) vs the JAX
pipeline: byte-identical (keys, variants, counts) across key widths,
strandedness, Ns, multi-record batches and mixed length buckets.

The native path is gated to explicit host operation (SKA_PLATFORM=cpu
or SKA_NATIVE_BUILD=1) so the JAX pipelines keep their CPU-backend test
coverage; these tests call both engines directly.
"""

import os
import tempfile
from pathlib import Path

import numpy as np
import pytest

from ska_tpu import api
from ska_tpu.io import fastx
from ska_tpu.sample import QualOpts

native = pytest.importorskip("ska_tpu.io.native")


def _write_fasta(path, recs):
    with open(path, "wb") as f:
        for j, r in enumerate(recs):
            f.write(b">r%d\n" % j + r + b"\n")


@pytest.mark.parametrize(
    "k,rc,S,nrec,L",
    [
        (31, True, 4, 1, 5000),
        (17, True, 3, 4, 800),
        (41, True, 2, 2, 3000),
        (63, True, 3, 1, 2000),
        (31, False, 2, 2, 1500),
        (9, True, 2, 3, 200),
    ],
)
def test_native_build_matches_jax_pipeline(tmp_path, monkeypatch, k, rc, S, nrec, L):
    rng = np.random.default_rng(k * 100 + S)
    acgtn = np.frombuffer(b"ACGTN", np.uint8)
    P = [0.245, 0.245, 0.245, 0.245, 0.02]
    monkeypatch.setenv("SKA_DISTRIBUTED", "0")

    batches, files = [], []
    for s in range(S):
        recs = [
            rng.choice(acgtn, size=int(rng.integers(k + 20, L)), p=P)
            .astype(np.uint8)
            .tobytes()
            for _ in range(nrec)
        ]
        batches.append(fastx.build_batch(recs, [None] * nrec))
        p = tmp_path / f"s{s}.fa"
        _write_fasta(p, recs)
        files.append((f"s{s}", str(p), None))

    keys_n, var_n, cnt_n = native.host_build([b.seq for b in batches], k, rc)

    monkeypatch.setenv("SKA_NATIVE_BUILD", "0")
    arr = api.build(files, k, rc, QualOpts(0, 0, 2))

    assert np.array_equal(keys_n, arr.keys)
    assert np.array_equal(var_n, arr.variants)
    assert np.array_equal(cnt_n, arr.counts)


def test_native_build_palindromes_and_fixture(tmp_path, monkeypatch):
    """Palindromic split k-mers (W/S sets) and the reference fixture pair."""
    monkeypatch.setenv("SKA_DISTRIBUTED", "0")
    # self-RC split k-mer: flank palindromes at k=5
    recs = [b"ACGTACGTACGTACGT", b"TTTTAAAATTTTAAAA"]
    batch = fastx.build_batch(recs, [None, None])
    keys_n, var_n, cnt_n = native.host_build([batch.seq], 5, True)
    p = tmp_path / "p.fa"
    _write_fasta(p, recs)
    monkeypatch.setenv("SKA_NATIVE_BUILD", "0")
    arr = api.build([("p", str(p), None)], 5, True, QualOpts(0, 0, 2))
    assert np.array_equal(keys_n, arr.keys)
    assert np.array_equal(var_n, arr.variants)
    monkeypatch.delenv("SKA_NATIVE_BUILD")

    fin = "/root/reference/tests/test_files_in"
    files = [("test_1", f"{fin}/test_1.fa", None), ("test_2", f"{fin}/test_2.fa", None)]
    monkeypatch.setenv("SKA_NATIVE_BUILD", "1")
    arr_native = api.build(files, 17, True, QualOpts(0, 0, 2))
    monkeypatch.setenv("SKA_NATIVE_BUILD", "0")
    arr_jax = api.build(files, 17, True, QualOpts(0, 0, 2))
    assert np.array_equal(arr_native.keys, arr_jax.keys)
    assert np.array_equal(arr_native.variants, arr_jax.variants)
    assert np.array_equal(arr_native.counts, arr_jax.counts)
    assert arr_native.names == arr_jax.names


def test_native_gate_leaves_fastq_to_jax(monkeypatch):
    """FASTQ cohorts must not take the native path (quality/count filters
    live in the JAX pipeline)."""
    from ska_tpu import sample as sample_mod

    fin = "/root/reference/tests/test_files_in"
    monkeypatch.setenv("SKA_NATIVE_BUILD", "1")
    prepared = [
        (fastx.build_batch([b"ACGT" * 50], [bytes([70]) * 200]), True)
    ]
    out = sample_mod._native_host_build(
        prepared, [("s", "s.fq", None)], 17, True
    )
    assert out is None


def test_native_ref_scan_matches_jax_refska(tmp_path, monkeypatch):
    """RefSka indexing via the native positional scan == the JAX
    extraction path (kmers, pos, chrom, rc, repeat spans), on a
    multi-chromosome reference with Ns and repeats."""
    from ska_tpu.ref import RefSka

    rng = np.random.default_rng(77)
    acgtn = np.frombuffer(b"ACGTN", np.uint8)
    P = [0.245, 0.245, 0.245, 0.245, 0.02]
    chroms = [
        rng.choice(acgtn, size=n, p=P).astype(np.uint8).tobytes()
        for n in (3000, 1200, 451)
    ]
    # inject a repeat so --repeat-mask spans are non-trivial
    rep = chroms[0][100:200]
    chroms[1] = chroms[1][:300] + rep + chroms[1][300:]
    p = tmp_path / "ref.fa"
    with open(p, "wb") as f:
        for j, c in enumerate(chroms):
            f.write(b">chr%d desc\n" % j + c + b"\n")

    for k, rc, repeat in [(31, True, False), (17, True, True), (41, False, False),
                          (63, True, True)]:
        monkeypatch.setenv("SKA_NATIVE_BUILD", "1")
        rn = RefSka(k, str(p), rc, False, repeat)
        monkeypatch.setenv("SKA_NATIVE_BUILD", "0")
        rj = RefSka(k, str(p), rc, False, repeat)
        assert np.array_equal(rn.kmers, rj.kmers), (k, rc)
        assert np.array_equal(rn.pos, rj.pos), (k, rc)
        assert np.array_equal(rn.chrom, rj.chrom), (k, rc)
        assert np.array_equal(rn.krc, rj.krc), (k, rc)
        assert np.array_equal(rn.repeat_coors, rj.repeat_coors), (k, rc)


def test_native_map_golden(monkeypatch):
    """End-to-end `ska map` with the native engines forced on must stay
    byte-exact against the reference golden."""
    import io

    from ska_tpu import api
    from ska_tpu.io import skf

    fin = "/root/reference/tests/test_files_in"
    fout = "/root/reference/tests/test_results_correct"
    monkeypatch.setenv("SKA_NATIVE_BUILD", "1")
    arr = skf.load(f"{fin}/merge_k9.skf")
    out = io.BytesIO()
    api.map_mode(arr, f"{fin}/test_ref.fa", out, fmt="aln")
    with open(f"{fout}/map_aln_k9.stdout", "rb") as f:
        assert out.getvalue() == f.read()
