"""merge / delete / weed / nk flows (reference tests/skf_ops.rs)."""

import io

import pytest

from ska_tpu.api import align, build, merge_mode, weed_mode
from ska_tpu.io import skf
from ska_tpu.sample import QualOpts


def _build_one(ref_in, name, k=31):
    return build([(name, f"{ref_in}/{name}.fa", None)], k, True, QualOpts())


def _match_wildcard(got, want):
    gl, wl = got.splitlines(), want.splitlines()
    assert len(gl) == len(wl), (gl, wl)
    for g, w in zip(gl, wl):
        if "[..]" in w:
            pre, post = w.split("[..]", 1)
            assert g.startswith(pre) and g.endswith(post)
        else:
            assert g == w


@pytest.mark.parametrize("k", [31, 41])
def test_merge_delete(tmp_path, ref_in, ref_out, k):
    a1 = _build_one(ref_in, "test_1", k)
    a2 = _build_one(ref_in, "test_2", k)
    p1 = skf.save(a1, str(tmp_path / "test_1"))
    p2 = skf.save(a2, str(tmp_path / "test_2"))
    merge_mode([p1, p2], str(tmp_path / "merge"))
    merged = skf.load(str(tmp_path / "merge.skf"))

    if k == 31:
        with open(f"{ref_out}/merge_nk.stdout") as f:
            _match_wildcard(merged.nk_display() + "\n", f.read())

    # deleting a missing sample fails
    with pytest.raises(ValueError):
        merged.copy_like().delete_samples(["test_3"])

    # delete test_2 -> nk equals the single-sample build
    d = merged.copy_like()
    d.delete_samples(["test_2"])
    assert d.nk_display() == a1.nk_display()


def test_weed_align(tmp_path, ref_in, ref_out):
    import shutil

    work = str(tmp_path / "merge.skf")
    shutil.copy(f"{ref_in}/merge.skf", work)

    arr = skf.load(work)
    weed_mode(arr, f"{ref_in}/weed.fa", False, 0.9, False, "no-filter", False, False, work)

    out = io.BytesIO()
    align(skf.load(work), out)
    with open(f"{ref_out}/weed_align.stdout", "rb") as f:
        assert out.getvalue() == f.read()

    # with const filter + min-freq 1, then nk --full-info
    arr = skf.load(work)
    weed_mode(arr, None, False, 1.0, False, "no-const", False, False, work)
    final = skf.load(work)
    got = final.nk_display() + "\n" + final.nk_full_info() + "\n"
    with open(f"{ref_out}/weed_nk.stdout") as f:
        _match_wildcard(got, f.read())


def test_weed_ambig_mask(tmp_path, ref_in, ref_out):
    import shutil

    work = str(tmp_path / "merge_k9.skf")
    shutil.copy(f"{ref_in}/merge_k9.skf", work)
    arr = skf.load(work)
    weed_mode(arr, None, False, 0.9, False, "no-filter", True, False, work)
    got = skf.load(work).nk_display() + "\n"
    with open(f"{ref_out}/weed_nk_k9.stdout") as f:
        _match_wildcard(got, f.read())


def test_weed_reverse(tmp_path, ref_in, ref_out):
    import shutil

    work = str(tmp_path / "merge.skf")
    shutil.copy(f"{ref_in}/merge.skf", work)
    arr = skf.load(work)
    weed_mode(arr, f"{ref_in}/weed.fa", True, 0.9, False, "no-filter", False, False, work)
    out = io.BytesIO()
    align(skf.load(work), out)
    with open(f"{ref_out}/weed_align_reverse.stdout", "rb") as f:
        assert out.getvalue() == f.read()


def test_weed_k41(tmp_path, ref_in, ref_out):
    a1 = _build_one(ref_in, "test_1", 41)
    a2 = _build_one(ref_in, "test_2", 41)
    from ska_tpu.merge import merge_samples  # noqa: F401

    arr = build(
        [("test_1", f"{ref_in}/test_1.fa", None), ("test_2", f"{ref_in}/test_2.fa", None)],
        41,
        True,
        QualOpts(),
    )
    work = str(tmp_path / "build_k41.skf")
    skf.save(arr, work)
    arr = skf.load(work)
    weed_mode(arr, None, False, 1.0, False, "no-ambig-or-const", False, False, work)
    final = skf.load(work)
    got = final.nk_display() + "\n" + final.nk_full_info() + "\n"
    with open(f"{ref_out}/weed_nk_k41.stdout") as f:
        _match_wildcard(got, f.read())
