"""`ska align` scenarios ported from reference tests/align.rs."""

import io

from ska_tpu.api import align, load_array
from ska_tpu.io import skf
from ska_tpu.merge import merge_samples
from ska_tpu.sample import QualOpts, build_sample

from helpers import aln_lengths, var_hash


def _align_out(arr, **kwargs):
    fh = io.BytesIO()
    align(arr, fh, **kwargs)
    return fh.getvalue().decode()


def _build(ref_in, k, names=("test_1", "test_2"), rc=True):
    q = QualOpts()
    samples = [
        build_sample(n, k, (f"{ref_in}/{n}.fa", None), rc, q) for n in names
    ]
    return merge_samples(samples)


def test_basic_align(ref_in):
    # align.rs:169-185 (build with defaults k=31 via load_array path)
    arr = load_array([f"{ref_in}/test_1.fa", f"{ref_in}/test_2.fa"])
    out = _align_out(arr)
    assert var_hash(out) == {("A", "T"), ("C", "T")}


def test_align_k15(ref_in):
    arr = _build(ref_in, 15)
    out = _align_out(arr)
    assert var_hash(out) == {("A", "T"), ("C", "T")}


def test_align_k33_u128(ref_in):
    # align.rs:115-145
    arr = _build(ref_in, 33)
    assert arr.kbits == 128
    out = _align_out(arr)
    assert var_hash(out) == {("C", "T"), ("T", "A")}


def test_filters_k9(ref_in):
    # align.rs:188-347: merge_k9.skf has a repeated k-mer / ambiguity
    def fresh():
        return skf.load(f"{ref_in}/merge_k9.skf")

    out = _align_out(fresh(), filter_type="no-filter", ignore_const_gaps=True)
    assert all(l == 38 for l in aln_lengths(out))

    out = _align_out(fresh(), filter_type="no-ambig", filter_ambig_as_missing=True)
    assert all(l == 37 for l in aln_lengths(out))

    out = _align_out(fresh(), filter_type="no-const")
    assert var_hash(out) == {("T", "A"), ("C", "T"), ("S", "G")}

    out = _align_out(fresh(), filter_type="no-ambig-or-const")
    assert var_hash(out) == {("T", "A"), ("C", "T")}

    out = _align_out(fresh(), filter_type="no-const", ambig_mask=True)
    assert var_hash(out) == {("T", "A"), ("C", "T"), ("N", "G")}

    out = _align_out(fresh(), filter_type="no-const", min_freq=0)
    assert all(l == 33 for l in aln_lengths(out))

    out = _align_out(fresh(), filter_type="no-const", min_freq=0, ignore_const_gaps=True)
    assert all(l == 3 for l in aln_lengths(out))

    out = _align_out(fresh(), filter_type="no-ambig-or-const", min_freq=0)
    assert all(l == 32 for l in aln_lengths(out))

    out = _align_out(
        fresh(), filter_type="no-ambig-or-const", min_freq=0, ignore_const_gaps=True
    )
    assert all(l == 2 for l in aln_lengths(out))


def test_proportion_reads_fasta(ref_in, ref_out):
    # align.rs:33-59: subsample half the records of proportion_reads.fa
    from ska_tpu.api import build

    arr = build(
        [("proportion_reads", f"{ref_in}/proportion_reads.fa", None)],
        17,
        rc=False,
        qual=QualOpts(),
        proportion_reads=0.5,
    )
    with open(f"{ref_out}/proportion_reads.stdout") as f:
        want = f.read()
    # println! adds a newline after Display and after Debug (lib.rs:813-816)
    got = arr.nk_display() + "\n" + arr.nk_full_info() + "\n"
    # wildcard the version line
    gl, wl = got.splitlines(), want.splitlines()
    assert len(gl) == len(wl)
    for g, w in zip(gl, wl):
        if "[..]" in w:
            pre, post = w.split("[..]", 1)
            assert g.startswith(pre) and g.endswith(post)
        else:
            assert g == w
