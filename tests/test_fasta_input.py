"""FASTA edge cases: N skipping, RC canonicalization, repeats, palindromes
(reference tests/fasta_input.rs)."""

import io

from ska_tpu.api import align, build, map_mode, weed_mode
from ska_tpu.io import skf
from ska_tpu.sample import QualOpts

from helpers import var_hash


def _build(ref_in, names, k, rc=True):
    files = [(n, f"{ref_in}/{n}.fa", None) for n in names]
    return build(files, k, rc, QualOpts())


def _align_out(arr, **kw):
    fh = io.BytesIO()
    align(arr, fh, **kw)
    return fh.getvalue().decode()


def _oracle(ref_out, name):
    with open(f"{ref_out}/{name}") as f:
        return f.read()


def test_align_n(ref_in, ref_out):
    arr = _build(ref_in, ["N_test_1", "N_test_2"], 31)
    assert _align_out(arr) == _oracle(ref_out, "align_N.stdout")


def test_map_n(ref_in, ref_out):
    arr = _build(ref_in, ["N_test_1", "N_test_2"], 11)
    fh = io.BytesIO()
    map_mode(arr, f"{ref_in}/test_ref.fa", fh, "aln")
    assert fh.getvalue().decode() == _oracle(ref_out, "map_N.stdout")


def test_rev_comp_same_alignment(ref_in):
    fwd = _align_out(_build(ref_in, ["test_1", "test_2"], 15))
    rc = _align_out(_build(ref_in, ["test_1", "test_2_rc"], 15))
    assert var_hash(fwd) == var_hash(rc)
    # single strand finds nothing shared with an rc'd genome
    ss = _align_out(_build(ref_in, ["test_1", "test_2_rc"], 15, rc=False))
    assert var_hash(ss) == set()
    # single strand, k=33 u128
    k33 = _align_out(_build(ref_in, ["test_1", "test_2"], 33, rc=False))
    assert var_hash(k33) == {("T", "A"), ("G", "A")}


def test_repeats_iupac(tmp_path, ref_in, ref_out):
    arr = _build(ref_in, ["dup_test_1", "dup_test_2"], 9, rc=False)
    assert _align_out(arr) == _oracle(ref_out, "dup_ss.stdout")

    # weed const sites, nk --full-info shows a single variant (dup_ss_nk)
    work = str(tmp_path / "dup_ss.skf")
    skf.save(arr, work)
    a = skf.load(work)
    weed_mode(a, None, False, 1.0, False, "no-const", False, False, work)
    final = skf.load(work)
    got = final.nk_display() + "\n" + final.nk_full_info() + "\n"
    want = _oracle(ref_out, "dup_ss_nk.stdout")
    gl, wl = got.splitlines(), want.splitlines()
    assert len(gl) == len(wl)
    for g, w in zip(gl, wl):
        if "[..]" in w:
            pre, post = w.split("[..]", 1)
            assert g.startswith(pre) and g.endswith(post)
        else:
            assert g == w

    arr = _build(ref_in, ["dup_test_1", "dup_test_2"], 9, rc=True)
    assert _align_out(arr) == _oracle(ref_out, "dup_rc.stdout")


def test_palindromes(ref_in, ref_out):
    arr = _build(ref_in, ["palindrome_1", "palindrome_2"], 15)
    assert _align_out(arr, filter_type="no-filter") == _oracle(ref_out, "palindrome.stdout")

    arr = _build(ref_in, ["palindrome_1", "palindrome_2"], 15, rc=False)
    assert _align_out(arr) == _oracle(ref_out, "palindrome_norc.stdout")

    arr = _build(ref_in, ["palindrome_reps_1", "palindrome_reps_2"], 15)
    assert _align_out(arr, filter_type="no-filter") == _oracle(
        ref_out, "palindrome_reps.stdout"
    )
