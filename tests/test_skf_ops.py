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


def test_native_extend_matches_numpy_64_samples():
    """The C++ B-way cross-batch merge must equal a reference numpy
    union on a 64-sample build split into 8 uneven batches (W=1, W=2)."""
    import numpy as np

    import ska_tpu.merge as merge_mod
    from ska_tpu.array import SkaArray

    rng = np.random.default_rng(12)
    for k, W in ((31, 1), (41, 2)):
        arrays = []
        col = 0
        for b, nb in enumerate([3, 9, 8, 8, 12, 8, 8, 8]):  # 64 total
            n = int(rng.integers(50, 200))
            keys = np.unique(
                rng.integers(0, 500, size=(n, W), dtype=np.uint64), axis=0
            )
            var = rng.choice(
                np.frombuffer(b"ACGT-NRY", dtype=np.uint8), size=(len(keys), nb)
            )
            counts = (var != ord("-")).sum(axis=1).astype(np.int64)
            arrays.append(
                SkaArray(
                    k=k, rc=True,
                    names=[f"s{col + i}" for i in range(nb)],
                    keys=keys, variants=var, counts=counts,
                )
            )
            col += nb

        got = merge_mod.extend_arrays(arrays)

        # independent numpy union (the pre-native formulation)
        all_keys = np.concatenate([a.keys for a in arrays], axis=0)
        order = np.lexsort([all_keys[:, i] for i in range(W - 1, -1, -1)])
        skeys = all_keys[order]
        first = np.ones(len(skeys), bool)
        first[1:] = np.any(skeys[1:] != skeys[:-1], axis=-1)
        ukeys = skeys[first]
        row_of = np.cumsum(first) - 1
        inv = np.empty(len(all_keys), np.int64)
        inv[order] = row_of
        n_rows = int(row_of[-1]) + 1
        variants = np.full((n_rows, 64), ord("-"), np.uint8)
        off = colx = 0
        for a in arrays:
            rows = inv[off : off + a.ksize]
            variants[rows, colx : colx + a.nsamples] = a.variants
            off += a.ksize
            colx += a.nsamples

        assert got.ksize == n_rows
        np.testing.assert_array_equal(got.keys, ukeys)
        np.testing.assert_array_equal(got.variants, variants)
        np.testing.assert_array_equal(
            got.counts, (variants != ord("-")).sum(axis=1)
        )


def test_extend_arrays_reference_row_order(ref_in):
    """Regression: reference-written .skf files store keys in hashmap
    order (io/skf.py preserves it), and the native B-way merge requires
    sorted inputs — extend_arrays must sort unsorted arrays first.
    merge.skf's 78 rows are stored unsorted; merging two permutations of
    it must yield exactly the 78-row union, not duplicated rows."""
    import numpy as np

    from ska_tpu.merge import extend_arrays

    a = skf.load(f"{ref_in}/merge.skf")
    flat_a = a.keys[:, 0]
    assert not np.all(flat_a[1:] >= flat_a[:-1])  # fixture really is unsorted

    b = a.copy_like()
    perm = np.random.default_rng(0).permutation(b.ksize)
    b.keys = b.keys[perm]
    b.variants = b.variants[perm]
    b.counts = b.counts[perm]
    b.names = [n + "_2" for n in b.names]

    m = extend_arrays([a, b])
    assert m.ksize == a.ksize
    flat_m = m.keys[:, 0]
    assert np.all(flat_m[1:] > flat_m[:-1])  # strictly sorted, no dup rows

    order_a = np.argsort(flat_a, kind="stable")
    va = a.variants[order_a]
    assert np.array_equal(m.keys[:, 0], flat_a[order_a])
    assert np.array_equal(m.variants[:, : a.nsamples], va)
    assert np.array_equal(m.variants[:, a.nsamples :], va)
    assert np.array_equal(
        np.asarray(m.counts), 2 * np.asarray(a.counts)[order_a]
    )


def test_extend_arrays_intra_batch_duplicate_keys():
    """A single malformed/third-party input batch may carry duplicate
    keys. The native B-way merge must collapse them into ONE union row
    keeping the LAST duplicate (the numpy fallback's fancy-assignment
    last-write-wins), not emit one row per duplicate
    (csrc/merge_batches.cpp duplicate-skip)."""
    import numpy as np

    import ska_tpu.merge as merge_mod
    from ska_tpu.array import SkaArray

    # batch a: keys [5, 7, 7, 9] with differing variants on the dup
    ka = np.array([[5], [7], [7], [9]], np.uint64)
    va = np.frombuffer(b"ACTG", np.uint8).reshape(4, 1).copy()
    a = SkaArray(k=31, rc=True, names=["a0"], keys=ka, variants=va,
                 counts=(va != ord("-")).sum(axis=1).astype(np.int64))
    # batch b: unique keys, overlaps the dup key
    kb = np.array([[7], [8]], np.uint64)
    vb = np.frombuffer(b"GA", np.uint8).reshape(2, 1).copy()
    b = SkaArray(k=31, rc=True, names=["b0"], keys=kb, variants=vb,
                 counts=(vb != ord("-")).sum(axis=1).astype(np.int64))

    m = merge_mod.extend_arrays([a, b])
    np.testing.assert_array_equal(m.keys[:, 0], [5, 7, 8, 9])
    # key 7 keeps batch a's LAST duplicate ('T'), plus batch b's 'G'
    np.testing.assert_array_equal(
        m.variants, np.frombuffer(b"A-TG-AG-", np.uint8).reshape(4, 2)
    )
    np.testing.assert_array_equal(m.counts, [1, 2, 1, 1])


def test_native_filter_keep_matches_numpy(monkeypatch):
    """csrc ska_filter_keep / ska_update_counts == the numpy filter
    chain (merge_ska_array.rs:289-402 / :139-163 semantics), across all
    four filter types, gap handling, ambig-as-missing, min_count and
    the byte-narrow counts dtype the .skf loader keeps."""
    import numpy as np

    import ska_tpu.io.native as native_mod
    from ska_tpu.array import SkaArray

    rng = np.random.default_rng(5)
    alphabet = np.frombuffer(b"ACGTUMRWSYKVHDBN-", dtype=np.uint8)

    def build(n, S, counts_dtype):
        v = alphabet[rng.integers(0, len(alphabet), size=(n, S))]
        counts = (v != ord("-")).sum(axis=1).astype(counts_dtype)
        keys = np.arange(n, dtype=np.uint64)[:, None]
        return SkaArray(
            k=31, rc=True, names=[f"s{i}" for i in range(S)],
            keys=keys, variants=v, counts=counts)

    for trial in range(12):
        n = int(rng.integers(0, 500))
        S = int(rng.integers(1, 7))
        dt = np.uint8 if trial % 3 == 0 else np.int64
        proto = build(n, S, dt)
        for ft in ("no-filter", "no-const", "no-ambig",
                   "no-ambig-or-const"):
            for icg in (False, True):
                for fam in (False, True):
                    mc = int(rng.integers(0, S + 1))
                    a = proto.copy_like()
                    b = proto.copy_like()
                    ra = a.filter(mc, fam, ft, fam, icg)
                    # force the numpy fallback for b
                    monkeypatch.setattr(
                        native_mod, "filter_keep", lambda *args: None)
                    monkeypatch.setattr(
                        native_mod, "update_counts", lambda *args: None)
                    try:
                        rb = b.filter(mc, fam, ft, fam, icg)
                    finally:
                        monkeypatch.undo()
                    assert ra == rb, (trial, ft, icg, fam, mc)
                    np.testing.assert_array_equal(a.keys, b.keys)
                    np.testing.assert_array_equal(a.variants, b.variants)
                    np.testing.assert_array_equal(
                        np.asarray(a.counts, np.int64),
                        np.asarray(b.counts, np.int64))
