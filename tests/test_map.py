"""`ska map` byte-exact comparisons against the reference oracle files."""

import io

import pytest

from ska_tpu.api import map_mode
from ska_tpu.io import skf
from ska_tpu.merge import merge_samples
from ska_tpu.sample import QualOpts, build_sample


def _map_out(arr, ref_fa, fmt="aln", ambig_mask=False, repeat_mask=False):
    if fmt == "aln":
        fh = io.BytesIO()
        map_mode(arr, ref_fa, fh, "aln", ambig_mask, repeat_mask)
        return fh.getvalue().decode()
    fh = io.StringIO()
    map_mode(arr, ref_fa, fh, "vcf", ambig_mask, repeat_mask)
    return fh.getvalue()


def _oracle(ref_out, name):
    with open(f"{ref_out}/{name}") as f:
        return f.read()


def _assert_vcf_matches(got, want):
    """Oracle VCFs wildcard the fileformat version line with [..]."""
    glines = got.splitlines()
    wlines = want.splitlines()
    assert len(glines) == len(wlines)
    for g, w in zip(glines, wlines):
        if "[..]" in w:
            pre, post = w.split("[..]", 1)
            assert g.startswith(pre) and g.endswith(post)
        else:
            assert g == w


CASES_ALN = [
    ("merge.skf", "test_ref.fa", "map_aln.stdout", {}),
    ("merge_k9.skf", "test_ref.fa", "map_aln_k9.stdout", {}),
    ("merge_k9.skf", "test_ref.fa", "map_aln_k9_filter.stdout", {"ambig_mask": True}),
    ("merge.skf", "test_ref_two_chrom.fa", "map_aln_two_chrom.stdout", {}),
    ("merge_k41.skf", "test_ref.fa", "map_aln_k41.stdout", {}),
    ("merge_k9.skf", "test_ref.fa", "map_aln_k9.masked.stdout", {"repeat_mask": True}),
    ("merge_k9.skf", "test_ref_two_chrom.fa", "map_all_repeats.masked.stdout", {"repeat_mask": True}),
    (
        "merge_k9.skf",
        "test_ref_two_chrom_repeats.fa",
        "map_aln_two_chrom.masked.stdout",
        {"repeat_mask": True},
    ),
]


@pytest.mark.parametrize("skf_file,ref_fa,oracle_name,kwargs", CASES_ALN)
def test_map_aln_oracles(ref_in, ref_out, skf_file, ref_fa, oracle_name, kwargs):
    arr = skf.load(f"{ref_in}/{skf_file}")
    got = _map_out(arr, f"{ref_in}/{ref_fa}", "aln", **kwargs)
    assert got == _oracle(ref_out, oracle_name)


CASES_VCF = [
    ("merge.skf", "test_ref.fa", "map_vcf.stdout", {}),
    ("merge.skf", "test_ref_two_chrom.fa", "map_vcf_two_chrom.stdout", {}),
    ("merge_k41.skf", "test_ref.fa", "map_vcf_k41.stdout", {}),
    ("merge_k9.skf", "test_ref.fa", "map_vcf_k9.masked.stdout", {"repeat_mask": True}),
    (
        "merge_k9.skf",
        "test_ref_two_chrom_repeats.fa",
        "map_vcf_two_chrom.masked.stdout",
        {"repeat_mask": True},
    ),
]


@pytest.mark.parametrize("skf_file,ref_fa,oracle_name,kwargs", CASES_VCF)
def test_map_vcf_oracles(ref_in, ref_out, skf_file, ref_fa, oracle_name, kwargs):
    arr = skf.load(f"{ref_in}/{skf_file}")
    got = _map_out(arr, f"{ref_in}/{ref_fa}", "vcf", **kwargs)
    _assert_vcf_matches(got, _oracle(ref_out, oracle_name))


def test_map_built_indels(ref_in, ref_out):
    q = QualOpts()
    s1 = build_sample("test_1", 31, (f"{ref_in}/test_1.fa", None), True, q)
    s2 = build_sample("indel_test", 31, (f"{ref_in}/indel_test.fa", None), True, q)
    arr = merge_samples([s1, s2])
    got = _map_out(arr, f"{ref_in}/test_ref.fa", "aln")
    assert got == _oracle(ref_out, "map_aln_indels.stdout")
    got = _map_out(arr, f"{ref_in}/test_ref.fa", "vcf")
    _assert_vcf_matches(got, _oracle(ref_out, "map_vcf_indels.stdout"))


def test_map_ambig(ref_in, ref_out):
    q = QualOpts()
    s1 = build_sample("ambig_test_1", 17, (f"{ref_in}/ambig_test_1.fa", None), False, q)
    s2 = build_sample("ambig_test_2", 17, (f"{ref_in}/ambig_test_2.fa", None), False, q)
    arr = merge_samples([s1, s2])
    got = _map_out(arr, f"{ref_in}/ambig_test_ref.fa", "aln")
    assert got == _oracle(ref_out, "map_aln_ambig.stdout")


def test_map_single_strand(ref_in, ref_out):
    q = QualOpts()
    s1 = build_sample("test_1", 9, (f"{ref_in}/test_1.fa", None), False, q)
    s2 = build_sample("test_2_rc", 9, (f"{ref_in}/test_2_rc.fa", None), False, q)
    arr = merge_samples([s1, s2])
    got = _map_out(arr, f"{ref_in}/test_ref.fa", "aln")
    assert got == _oracle(ref_out, "map_ss.stdout")
    got = _map_out(arr, f"{ref_in}/test_ref.fa", "vcf")
    _assert_vcf_matches(got, _oracle(ref_out, "map_vcf_ss.stdout"))


def test_repeat_coors_vectorized_matches_literal_loop(tmp_path):
    """The vectorized repeat-span union must equal the reference's literal
    per-k-mer loop (ska_ref.rs:261-298), including the chrom_offset quirk
    where a chromosome contributing no k-mers is skipped in the offset."""
    import numpy as np

    from ska_tpu.array import _combine128
    from ska_tpu.ref import RefSka

    rep = "ACGTACGTACGTACGTACGTT"  # repeated block -> repeat k-mers
    fa = tmp_path / "multi.fa"
    with open(fa, "w") as f:
        f.write(">c0\n" + rep + "GGATC" + rep + "\n")
        f.write(">c1\n" + "N" * 30 + "\n")  # no valid k-mers: offset quirk
        f.write(">c2\n" + rep + "CCTAG" + rep + "\n")

    ref = RefSka(9, str(fa), True, ambig_mask=False, repeat_mask=True)

    # literal reimplementation of the reference loop
    flat = ref.kmers[:, 0] if ref.kmers.shape[1] == 1 else _combine128(ref.kmers)
    uniq, counts = np.unique(flat, return_counts=True)
    is_rep = np.isin(flat, uniq[counts > 1])
    h = (9 - 1) // 2
    expected = []
    last_chrom = last_end = chrom_offset = 0
    for i in range(len(ref.kmers)):
        ci = int(ref.chrom[i])
        if ci > last_chrom:
            chrom_offset += len(ref.seq[last_chrom])
            last_chrom = ci
        if is_rep[i]:
            start = int(ref.pos[i]) - h + chrom_offset
            end = int(ref.pos[i]) + h + chrom_offset
            rng = range(start, end + 1) if (start > last_end or start == 0) else range(last_end + 1, end + 1)
            expected.extend(rng)
            last_chrom = ci
            last_end = end

    assert len(expected) > 0
    assert ref.repeat_coors.tolist() == expected


def test_refska_chunked_matches_single_dispatch(tmp_path, monkeypatch):
    """A tiny forced chunk cap must not change the reference index
    (keys, positions, chrom ids, strands) or map/vcf output."""
    import io

    import numpy as np

    from ska_tpu.ref import RefSka

    rng = np.random.default_rng(41)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "big.fa"
    g1 = rng.choice(bases, size=7000)
    g1[rng.choice(7000, 30, replace=False)] = ord("N")
    g2 = rng.choice(bases, size=900)
    with open(fa, "w") as f:
        f.write(">c1\n" + g1.tobytes().decode() + "\n>c2\n" + g2.tobytes().decode() + "\n")

    want = RefSka(31, str(fa), True, False, True)
    monkeypatch.setenv("SKA_MAX_CHUNK_BASES", "2048")
    got = RefSka(31, str(fa), True, False, True)

    np.testing.assert_array_equal(got.kmers, want.kmers)
    np.testing.assert_array_equal(got.pos, want.pos)
    np.testing.assert_array_equal(got.chrom, want.chrom)
    np.testing.assert_array_equal(got.krc, want.krc)
    np.testing.assert_array_equal(got.repeat_coors, want.repeat_coors)


def test_map_rev_comp_build_equivalence(ref_in, tmp_path):
    """A canonical (rc=True) build from reverse-complemented input maps
    identically to one from forward input (intent of tests/map.rs:170-204;
    the reference's own rc assertion is vacuous — it maps a nonexistent
    fwd_build.skf, and its test_2_rc.fa fixture drops one base of the true
    RC — so we compute the exact RC and assert the real equivalence)."""
    seq = open(f"{ref_in}/test_2.fa").read().splitlines()[1]
    comp = str.maketrans("ACGT", "TGCA")
    rc_fa = tmp_path / "test_2_true_rc.fa"
    rc_fa.write_text(">sample1\n" + seq.translate(comp)[::-1] + "\n")
    q = QualOpts()
    fwd = merge_samples(
        [
            build_sample("test_1", 9, (f"{ref_in}/test_1.fa", None), True, q),
            build_sample("test_2", 9, (f"{ref_in}/test_2.fa", None), True, q),
        ]
    )
    rc = merge_samples(
        [
            build_sample("test_1", 9, (f"{ref_in}/test_1.fa", None), True, q),
            build_sample("test_2", 9, (str(rc_fa), None), True, q),
        ]
    )
    got_fwd = _map_out(fwd, f"{ref_in}/test_ref.fa", "aln")
    got_rc = _map_out(rc, f"{ref_in}/test_ref.fa", "aln")
    # compare sequence lines only (names differ), like cmp_map_aln
    seq = lambda s: s.splitlines()[1::2]
    assert seq(got_rc) == seq(got_fwd)


def test_map_thread_count_invariant(ref_in, monkeypatch):
    """SKA_THREADS must not change a single output byte: pseudoalignment
    rows are written by an order-preserving per-sample pool (the
    reference's par_iter_mut axis, ska_ref.rs:572-605)."""
    arr = skf.load(f"{ref_in}/merge.skf")
    monkeypatch.delenv("SKA_THREADS", raising=False)
    one = _map_out(arr, f"{ref_in}/test_ref.fa", "aln")
    monkeypatch.setenv("SKA_THREADS", "4")
    four = _map_out(arr, f"{ref_in}/test_ref.fa", "aln")
    assert one == four
    monkeypatch.setenv("SKA_THREADS", "4")
    vcf1 = _map_out(arr, f"{ref_in}/test_ref.fa", "vcf")
    monkeypatch.delenv("SKA_THREADS")
    assert vcf1 == _map_out(arr, f"{ref_in}/test_ref.fa", "vcf")
