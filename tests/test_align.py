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


def test_parallel_build_scale_45_fixtures(ref_in, monkeypatch):
    """Port of the reference's serial-vs-parallel build equivalence test
    (tests/align.rs:349-397) at real fixture scale: build the 45 gz
    samples under par_test/ through two different build algorithms — the
    serial batched device path (6 batches of <=8, cross-batch union) and
    the mesh-sharded distributed merge — and assert the `ska align`
    outputs are column-set identical (var_hash)."""
    import glob
    import io

    from ska_tpu.api import align, build
    from ska_tpu.sample import QualOpts

    from helpers import var_hash

    files = sorted(glob.glob(f"{ref_in}/par_test/*.fa.gz"))
    assert len(files) == 45
    # the reference rfile uses the path as the sample name (create_par_rfile)
    input_files = [(p, p, None) for p in files]

    outs = {}
    for mode, env in (("serial", "0"), ("distributed", "1")):
        monkeypatch.setenv("SKA_DISTRIBUTED", env)
        arr = build(input_files, 15, True, QualOpts())
        fh = io.BytesIO()
        align(arr, fh)  # ska align defaults: NoConst, min_freq 0.9
        outs[mode] = fh.getvalue()

    assert var_hash(outs["serial"]) == var_hash(outs["distributed"])
    assert len(var_hash(outs["serial"])) > 0
