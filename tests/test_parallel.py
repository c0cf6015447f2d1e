"""Mesh-sharded build on the virtual 8-device CPU mesh vs the serial path.

Covers the VERDICT round-2 criteria for the distributed merge: W=2 keys
(k=41), FASTQ min-count filtering, non-divisible sample counts, and the
capacity-escalation overflow path.
"""

import numpy as np

import jax
import pytest

from ska_tpu.parallel import (
    build_mesh,
    distributed_build,
    distributed_merged_build,
    dryrun_step,
)
from ska_tpu.sample import QualOpts, dict_from_batch
from ska_tpu.io import fastx
from ska_tpu.merge import merge_samples
from ska_tpu.sample import SampleDict


def test_dryrun_8_devices():
    assert len(jax.devices()) >= 8
    n_rows = dryrun_step(8)
    assert n_rows > 0


def _serial_merge(seqs, k, qual=None, is_reads=False):
    qual = qual or QualOpts()
    samples = []
    for i in range(len(seqs)):
        batch = fastx.build_batch([seqs[i].tobytes()])
        kk, ss = dict_from_batch(batch, k, True, qual, is_reads)
        samples.append(SampleDict(name=f"s{i}", k=k, rc=True, keys=kk, sets=ss))
    return merge_samples(samples)


@pytest.mark.parametrize("k", [17, 41])
@pytest.mark.parametrize("n_samples", [8, 11])
def test_distributed_build_matches_serial(k, n_samples):
    """k=41 exercises the W=2 two-limb key path; n_samples=11 the
    non-divisible sample padding."""
    rng = np.random.default_rng(42)
    L = 300
    seqs = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(n_samples, L))
    # sprinkle ~2% N so the N-skip path is exercised but k=41 windows survive
    nmask = rng.random((n_samples, L)) < 0.02
    seqs[nmask] = ord("N")
    mesh = build_mesh(8)
    valid = (seqs & 0xF) != 14
    rec_last = np.zeros((n_samples, L), bool)
    rec_last[:, -1] = True
    keys, variants, counts, n_rows = distributed_build(seqs, valid, rec_last, k, True, mesh)

    arr = _serial_merge(seqs, k)
    assert n_rows == arr.ksize
    np.testing.assert_array_equal(keys, arr.keys)
    np.testing.assert_array_equal(variants, arr.variants)
    np.testing.assert_array_equal(counts, arr.counts)


def test_distributed_build_repeat_iupac():
    """A k-mer occurring twice in one sample with different middle bases
    must produce an IUPAC union (per-sample union runs BEFORE the
    exchange; the round-1 scatter dropped one occurrence)."""
    k = 7
    # kmer flanks identical, middles differ: unit 'GGGACCC' vs 'GGGTCCC'
    seq = (b"AATTGGGACCCTTAA" + b"AATTGGGTCCCTTAA").decode()
    seqs = np.frombuffer((seq + "A" * 10).encode(), dtype=np.uint8)[None, :].repeat(2, 0)
    mesh = build_mesh(2)
    valid = np.ones_like(seqs, bool)
    rec_last = np.zeros_like(seqs, bool)
    rec_last[:, -1] = True
    keys, variants, counts, n_rows = distributed_build(seqs, valid, rec_last, k, True, mesh)
    arr = _serial_merge(seqs, k)
    np.testing.assert_array_equal(keys, arr.keys)
    np.testing.assert_array_equal(variants, arr.variants)


@pytest.mark.parametrize("min_count", [1, 2, 3])
def test_distributed_fastq_min_count(min_count):
    """FASTQ path: min-count rank filter per sample inside the mesh step."""
    rng = np.random.default_rng(7)
    k = 17
    n_samples, n_reads, RL = 5, 24, 60
    mesh = build_mesh(8)
    qual = QualOpts(min_count=min_count, min_qual=0, qual_filter=0)

    all_seqs, all_valid, all_qual, all_rl = [], [], [], []
    serial_samples = []
    base_reads = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(4, RL))
    for i in range(n_samples):
        # duplicate a few reads so some k-mers cross the count threshold
        reads = [base_reads[rng.integers(0, 4)] for _ in range(n_reads)]
        flat = [r.tobytes() for r in reads]
        batch = fastx.build_batch(flat)
        kk, ss = dict_from_batch(batch, k, True, qual, True)
        serial_samples.append(
            SampleDict(name=f"s{i}", k=k, rc=True, keys=kk, sets=ss)
        )
        all_seqs.append(batch.seq)
        all_valid.append(((batch.seq & 0xF) != 14) & (batch.seq != 0))
        all_qual.append(np.ones(len(batch.seq), bool))
        all_rl.append(batch.rec_last)

    L = max(len(s) for s in all_seqs)
    S = n_samples
    seqs = np.zeros((S, L), np.uint8)
    valid = np.zeros((S, L), bool)
    qok = np.zeros((S, L), bool)
    rl = np.zeros((S, L), bool)
    for i in range(S):
        n = len(all_seqs[i])
        seqs[i, :n] = all_seqs[i]
        valid[i, :n] = all_valid[i]
        qok[i, :n] = all_qual[i]
        rl[i, :n] = all_rl[i]

    keys, variants, counts, n_rows = distributed_merged_build(
        seqs, valid, qok, rl, k, True, mesh,
        is_reads=True, use_mid_qual=False, min_count=min_count,
    )
    arr = merge_samples(serial_samples)
    assert n_rows == arr.ksize
    np.testing.assert_array_equal(keys, arr.keys)
    np.testing.assert_array_equal(variants, arr.variants)
    np.testing.assert_array_equal(counts, arr.counts)


def test_distributed_build_skewed_keys_escalates():
    """All-identical samples concentrate per-pair traffic; the overflow
    escalation must still produce the exact serial result."""
    rng = np.random.default_rng(3)
    k = 17
    one = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=300)
    seqs = np.broadcast_to(one, (8, 300)).copy()
    mesh = build_mesh(8)
    valid = np.ones_like(seqs, bool)
    rec_last = np.zeros_like(seqs, bool)
    rec_last[:, -1] = True
    keys, variants, counts, n_rows = distributed_build(seqs, valid, rec_last, k, True, mesh)
    arr = _serial_merge(seqs, k)
    assert n_rows == arr.ksize
    np.testing.assert_array_equal(keys, arr.keys)
    np.testing.assert_array_equal(variants, arr.variants)


def test_api_build_distributed_matches_serial(tmp_path, monkeypatch):
    """SKA_DISTRIBUTED=1 routes api.build through the mesh path; results
    must equal the serial build exactly (keys, variants, names, counts)."""
    from ska_tpu.api import build

    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    files = []
    for i in range(5):
        g = rng.choice(bases, size=400 + 37 * i)
        p = tmp_path / f"g{i}.fa"
        with open(p, "wb") as f:
            f.write(b">g%d\n" % i + g.tobytes() + b"\n")
        files.append((f"g{i}", str(p), None))

    monkeypatch.setenv("SKA_DISTRIBUTED", "0")
    serial = build(files, 31, True, QualOpts())
    monkeypatch.setenv("SKA_DISTRIBUTED", "1")
    dist = build(files, 31, True, QualOpts())

    assert dist.names == serial.names
    np.testing.assert_array_equal(dist.keys, serial.keys)
    np.testing.assert_array_equal(dist.variants, serial.variants)
    np.testing.assert_array_equal(dist.counts, serial.counts)


def test_init_multihost_noop_without_config(monkeypatch):
    """Without SKA_COORDINATOR the helper is a no-op returning False."""
    from ska_tpu.parallel import init_multihost, is_primary

    monkeypatch.delenv("SKA_COORDINATOR", raising=False)
    assert init_multihost() is False
    assert init_multihost(num_processes=1) is False
    assert is_primary() is True  # single process is host 0


def test_distributed_fastq_mid_qual_gate():
    """Middle-base quality gate (use_mid_qual) inside the mesh step: bases
    with low quality at the window middle are dropped per sample, exactly
    as in the serial pipeline."""
    rng = np.random.default_rng(11)
    k = 17
    n_samples, L = 3, 240
    mesh = build_mesh(8)
    from ska_tpu.constants import QUAL_MIDDLE

    qual = QualOpts(min_count=0, min_qual=20, qual_filter=QUAL_MIDDLE)

    seqs = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(n_samples, L))
    squal = rng.integers(33, 75, size=(n_samples, L), dtype=np.uint8)
    valid = np.ones((n_samples, L), bool)
    qok = (squal.astype(np.int16) - 33) > qual.min_qual
    rl = np.zeros((n_samples, L), bool)
    rl[:, -1] = True

    serial = []
    for i in range(n_samples):
        batch = fastx.build_batch([seqs[i].tobytes()], [squal[i].tobytes()])
        kk, ss = dict_from_batch(batch, k, True, qual, True)
        serial.append(SampleDict(name=f"s{i}", k=k, rc=True, keys=kk, sets=ss))
    arr = merge_samples(serial)

    keys, variants, counts, n_rows = distributed_merged_build(
        seqs, valid, qok, rl, k, True, mesh,
        is_reads=True, use_mid_qual=True, min_count=0,
    )
    assert n_rows == arr.ksize
    np.testing.assert_array_equal(keys, arr.keys)
    np.testing.assert_array_equal(variants, arr.variants)


def test_api_build_distributed_with_oversized_sample(tmp_path, monkeypatch):
    """An oversized sample routes through the chunked per-sample build
    even on the mesh path; the result equals the serial build."""
    from ska_tpu.api import build

    rng = np.random.default_rng(17)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    files = []
    for i, size in enumerate((600, 5000, 700)):
        g = rng.choice(bases, size=size)
        p = tmp_path / f"m{i}.fa"
        with open(p, "wb") as f:
            f.write(b">m%d\n" % i + g.tobytes() + b"\n")
        files.append((f"m{i}", str(p), None))

    monkeypatch.setenv("SKA_DISTRIBUTED", "0")
    want = build(files, 31, True, QualOpts())
    monkeypatch.setenv("SKA_DISTRIBUTED", "1")
    monkeypatch.setenv("SKA_MAX_CHUNK_BASES", "2048")
    got = build(files, 31, True, QualOpts())
    assert got.names == want.names
    np.testing.assert_array_equal(got.keys, want.keys)
    np.testing.assert_array_equal(got.variants, want.variants)


def test_api_build_mixed_length_single_exchange(tmp_path, monkeypatch):
    """A mixed-length cohort (3 padded-length buckets, 64 samples) must
    flow through ONE key-range exchange: api.build receives a single
    batch tuple and never invokes the host cross-batch merge
    (merge_ska_dict.rs:354-417 — one global merge regardless of sample
    shape). Results equal the serial path exactly."""
    import ska_tpu.api as api_mod

    rng = np.random.default_rng(23)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = rng.choice(bases, size=3700)
    files = []
    # 64 samples spanning buckets 1024 / 2048 / 4096
    for i in range(64):
        size = (600, 1500, 2900)[i % 3] + 11 * (i // 3)
        g = ref[:size].copy()
        pos = rng.choice(size, size=5, replace=False)
        g[pos] = bases[(np.searchsorted(bases, g[pos]) + 1) % 4]
        p = tmp_path / f"x{i}.fa"
        with open(p, "wb") as f:
            f.write(b">x%d\n" % i + g.tobytes() + b"\n")
        files.append((f"x{i}", str(p), None))

    monkeypatch.setenv("SKA_DISTRIBUTED", "0")
    want = api_mod.build(files, 31, True, QualOpts())

    def _poisoned(arrays):
        raise AssertionError(
            "host cross-batch merge invoked on a pure mesh build"
        )

    monkeypatch.setenv("SKA_DISTRIBUTED", "1")
    monkeypatch.setattr(api_mod, "extend_arrays", _poisoned)
    got = api_mod.build(files, 31, True, QualOpts())
    assert got.names == want.names
    np.testing.assert_array_equal(got.keys, want.keys)
    np.testing.assert_array_equal(got.variants, want.variants)
    np.testing.assert_array_equal(got.counts, want.counts)


def test_distributed_build_genome_scale_with_escalation(monkeypatch):
    """Genome-scale mesh stress (VERDICT r2 #5): 4 samples x ~1 Mb through
    the virtual 8-device mesh at W=1 (k=31, with SKA_MESH_CPAIR_INIT
    shrunk to force the capacity-escalation retry loop) and W=2 (k=63),
    byte-identical to the serial path."""
    rng = np.random.default_rng(31)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    L = (1 << 20) - 64  # keeps L + k + 1 inside the 2^20 serial bucket
    ref = rng.choice(bases, size=L)
    seqs = np.broadcast_to(ref, (4, L)).copy()
    for i in range(4):
        pos = rng.choice(L, size=1000, replace=False)
        seqs[i, pos] = bases[(np.searchsorted(bases, seqs[i, pos]) + 1 + i) % 4]
    valid = np.ones((4, L), bool)
    rec_last = np.zeros((4, L), bool)
    rec_last[:, -1] = True
    mesh = build_mesh(8)

    # W=1 with a deliberately undersized first capacity: must escalate
    # (>= 1 doubling) and still match the serial result exactly
    monkeypatch.setenv("SKA_MESH_CPAIR_INIT", str(1 << 16))
    keys, variants, counts, n_rows = distributed_build(
        seqs, valid, rec_last, 31, True, mesh
    )
    arr = _serial_merge(seqs, 31)
    assert n_rows == arr.ksize
    np.testing.assert_array_equal(keys, arr.keys)
    np.testing.assert_array_equal(variants, arr.variants)
    np.testing.assert_array_equal(counts, arr.counts)

    # W=2 two-limb keys at the same scale, normal capacity
    monkeypatch.delenv("SKA_MESH_CPAIR_INIT")
    keys2, variants2, _, n2 = distributed_build(
        seqs, valid, rec_last, 63, True, mesh
    )
    arr2 = _serial_merge(seqs, 63)
    assert n2 == arr2.ksize
    np.testing.assert_array_equal(keys2, arr2.keys)
    np.testing.assert_array_equal(variants2, arr2.variants)


def test_distributed_build_int64_scatter_branch(monkeypatch):
    """The int64 flat-scatter widening (taken for real once
    M * n_samples >= 2^31) must produce identical results; driven here by
    shrinking the module threshold on an otherwise-uncompiled shape."""
    import ska_tpu.parallel.build as pb

    monkeypatch.setattr(pb, "_I32_SCATTER_LIMIT", 1000)
    rng = np.random.default_rng(13)
    seqs = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(9, 333))
    valid = np.ones((9, 333), bool)
    rec_last = np.zeros((9, 333), bool)
    rec_last[:, -1] = True
    mesh = build_mesh(8)
    keys, variants, counts, n_rows = distributed_build(
        seqs, valid, rec_last, 19, True, mesh
    )
    arr = _serial_merge(seqs, 19)
    assert n_rows == arr.ksize
    np.testing.assert_array_equal(keys, arr.keys)
    np.testing.assert_array_equal(variants, arr.variants)
    np.testing.assert_array_equal(counts, arr.counts)


# ---------------------------------------------------------------------------
# distributed post-build modes (map lookup + distance Gram)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("W,n_dev", [(1, 8), (2, 8), (1, 3), (1, 1)])
def test_distributed_lookup_matches_serial(W, n_dev):
    """Key-range-sharded lookup == serial searchsorted + equality check,
    with hits, misses, duplicates, and out-of-range queries."""
    from ska_tpu.parallel.postbuild import distributed_lookup

    rng = np.random.default_rng(42 + W + n_dev)
    R, Q = 1000, 700
    keys = rng.integers(0, 1 << 60, size=(R + 200, W), dtype=np.uint64)
    keys = np.unique(keys, axis=0)[:R]
    # queries: half real keys (hits incl. duplicates), half random (mostly
    # misses), plus boundary cases
    qs = np.concatenate(
        [
            keys[rng.integers(0, len(keys), size=Q // 2)],
            rng.integers(0, 1 << 60, size=(Q - Q // 2, W), dtype=np.uint64),
            keys[:1],                      # global min
            keys[-1:],                     # global max
            np.zeros((1, W), np.uint64),   # below all
            np.full((1, W), (1 << 60) - 1, np.uint64),  # above most
        ]
    )
    mesh = build_mesh(n_dev)
    found, rows = distributed_lookup(keys, qs, mesh)

    # serial oracle
    from ska_tpu.array import _np_member
    import ska_tpu.ops.keys as K

    if W == 1:
        idx = np.searchsorted(keys[:, 0], qs[:, 0])
    else:
        comb = np.ascontiguousarray(keys.astype(">u8")).view("S16").ravel()
        qc = np.ascontiguousarray(qs.astype(">u8")).view("S16").ravel()
        idx = np.searchsorted(comb, qc)
    idx_c = np.clip(idx, 0, len(keys) - 1)
    oracle_found = np.all(keys[idx_c] == qs, axis=-1)
    assert np.array_equal(found, oracle_found)
    assert np.array_equal(rows[found], idx_c[oracle_found])


def test_distributed_lookup_capacity_escalation(monkeypatch):
    """All queries landing in one device's key range must escalate the
    all_to_all capacity, not drop answers."""
    from ska_tpu.parallel import postbuild

    rng = np.random.default_rng(7)
    keys = np.sort(rng.integers(0, 1 << 60, size=512, dtype=np.uint64))
    keys = np.unique(keys)[:, None]
    # every query inside the FIRST device's range -> bucket skew
    qs = keys[: len(keys) // 8][rng.integers(0, len(keys) // 8, size=400)]
    mesh = build_mesh(8)
    found, rows = postbuild.distributed_lookup(keys, qs, mesh)
    assert found.all()
    assert np.array_equal(keys[rows], qs)


@pytest.mark.parametrize("n,alpha", [(4, b"-ACGT"), (6, b"-ACGTRYSN")])
def test_distributed_class_gram_matches_serial(n, alpha):
    from ska_tpu.distance import class_gram
    from ska_tpu.parallel.postbuild import distributed_class_gram

    rng = np.random.default_rng(5 + n)
    letters = np.frombuffer(alpha, np.uint8)
    variants = letters[rng.integers(0, len(letters), size=(5000, n))]
    mesh = build_mesh(8)
    G_dist = distributed_class_gram(variants, mesh)
    G_serial = class_gram(variants, on_host=True)
    assert np.array_equal(G_dist, G_serial)


def test_distributed_map_pipeline_equality(tmp_path):
    """End-to-end: RefSka.map rows via distributed lookup == serial map
    (same mapped variants in the same positional order)."""
    from ska_tpu.api import build
    from ska_tpu.parallel.postbuild import distributed_lookup
    from ska_tpu.ref import RefSka
    from ska_tpu.sample import QualOpts
    import ska_tpu.ops.keys as K
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = rng.choice(bases, size=5000)
    files = []
    for i in range(3):
        g = ref.copy()
        pos = rng.choice(len(g), size=50, replace=False)
        g[pos] = bases[(np.searchsorted(bases, g[pos]) + 1) % 4]
        p = tmp_path / f"s{i}.fa"
        p.write_bytes(b">s%d\n" % i + g.tobytes() + b"\n")
        files.append((f"s{i}", str(p), None))
    ref_f = tmp_path / "ref.fa"
    ref_f.write_bytes(b">ref\n" + ref.tobytes() + b"\n")

    qual = QualOpts(min_count=0, min_qual=0, qual_filter="strict")
    arr = build(files, 17, True, qual)
    ska_ref = RefSka(17, str(ref_f), True, False, False)

    sorted_keys, perm = arr.sorted_view()
    # serial
    idx = np.asarray(
        K.searchsorted_via_sort(jnp.asarray(sorted_keys), jnp.asarray(ska_ref.kmers))
    )
    idx_c = np.clip(idx, 0, arr.ksize - 1)
    s_found = np.all(sorted_keys[idx_c] == ska_ref.kmers, axis=-1)
    # distributed
    mesh = build_mesh(8)
    d_found, d_rows = distributed_lookup(sorted_keys, ska_ref.kmers, mesh)
    assert np.array_equal(d_found, s_found)
    assert np.array_equal(d_rows[d_found], idx_c[s_found])


def test_distributed_modes_end_to_end_equality(tmp_path, monkeypatch):
    """`ska map` and `ska distance` outputs are byte-identical with the
    mesh path forced on (SKA_DISTRIBUTED=1, 8-device virtual mesh) vs
    forced off."""
    import io

    from ska_tpu import api
    from ska_tpu.sample import QualOpts

    rng = np.random.default_rng(23)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = rng.choice(bases, size=8000)
    files = []
    for i in range(4):
        g = ref.copy()
        pos = rng.choice(len(g), size=80, replace=False)
        g[pos] = bases[(np.searchsorted(bases, g[pos]) + 1 + i % 3) % 4]
        p = tmp_path / f"s{i}.fa"
        p.write_bytes(b">s%d\n" % i + g.tobytes() + b"\n")
        files.append((f"s{i}", str(p), None))
    ref_f = tmp_path / "ref.fa"
    ref_f.write_bytes(b">ref\n" + ref.tobytes() + b"\n")
    qual = QualOpts(min_count=0, min_qual=0, qual_filter="strict")

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("SKA_DISTRIBUTED", flag)
        arr = api.build(files, 31, True, qual)
        m = io.BytesIO()
        api.map_mode(arr.copy_like(), str(ref_f), m, fmt="aln")
        v = io.StringIO()
        api.map_mode(arr.copy_like(), str(ref_f), v, fmt="vcf")
        d = io.StringIO()
        api.distance_mode(arr.copy_like(), d, min_freq=0.0, filt_ambig=True)
        outs[flag] = (m.getvalue(), v.getvalue(), d.getvalue())
    assert outs["0"][0] == outs["1"][0], "map aln differs"
    assert outs["0"][1] == outs["1"][1], "map vcf differs"
    assert outs["0"][2] == outs["1"][2], "distance differs"


def test_distributed_class_gram_multi_chunk(monkeypatch):
    """Shrinking the shared scratch budget must drive the mesh Gram's
    per-device chunk loop (several sharded dispatches summed on host)
    without changing a single count."""
    import ska_tpu.distance as dist_mod
    from ska_tpu.distance import class_gram
    from ska_tpu.parallel.postbuild import distributed_class_gram

    rng = np.random.default_rng(9)
    letters = np.frombuffer(b"-ACGTN", np.uint8)
    # 10 samples: random rows stay (nearly) unique, so dedup cannot
    # collapse the input below the shrunken per-device chunk bound —
    # the loop genuinely runs several sharded dispatches
    variants = letters[rng.integers(0, len(letters), size=(60000, 10))]
    mesh = build_mesh(8)
    G_one = distributed_class_gram(variants, mesh)
    monkeypatch.setattr(dist_mod, "GRAM_SCRATCH_BYTES", 1 << 16)
    G_many = distributed_class_gram(variants, mesh)
    assert np.array_equal(G_one, G_many)
    assert np.array_equal(G_many, class_gram(variants, on_host=True))
