"""Unit tests for lookup/runtime primitives added for genome-scale perf:
sort-merge searchsorted, skalo's sorted-array k-mer map, and LazySeq."""

import numpy as np
import jax.numpy as jnp
import pytest

from ska_tpu.ops import keys as K


@pytest.mark.parametrize("W", [1, 2])
def test_searchsorted_via_sort_matches_numpy(W):
    rng = np.random.default_rng(11)
    N, M = 5000, 3777
    base = np.sort(rng.integers(0, 400, size=N, dtype=np.uint64))
    q = rng.integers(0, 400, size=M, dtype=np.uint64)
    tab = np.zeros((N, W), np.uint64)
    tab[:, W - 1] = base
    qq = np.zeros((M, W), np.uint64)
    qq[:, W - 1] = q
    got = np.asarray(K.searchsorted_via_sort(jnp.asarray(tab), jnp.asarray(qq)))
    assert (got == np.searchsorted(base, q, side="left")).all()


def test_searchsorted_via_sort_edges():
    tab = jnp.asarray(np.array([[5], [5], [9]], dtype=np.uint64))
    q = jnp.asarray(np.array([[0], [5], [7], [9], [12]], dtype=np.uint64))
    got = np.asarray(K.searchsorted_via_sort(tab, q))
    assert got.tolist() == [0, 0, 2, 2, 3]


def test_kmer_map_lookup():
    from ska_tpu.skalo.positioning import extract_genomic_kmers
    from ska_tpu.skalo.kmer_utils import encode_str

    import tempfile, os

    # ACGTACGTACGT...: every 5-mer there repeats ~50 times; the reference
    # (positioning.rs:80-88) keeps the FIRST <=3 positions of every k-mer
    # (its overflow-delete branch is dead code: push is guarded by len<3).
    # Append a unique tail so some k-mers have < 3 positions too.
    seq = b"ACGT" * 50 + b"GGATCCTTAAGGCC"
    with tempfile.NamedTemporaryFile("wb", suffix=".fa", delete=False) as f:
        f.write(b">r\n" + seq + b"\n")
        path = f.name
    try:
        km, genome, name = extract_genomic_kmers(path, 5)
        s = seq.decode()
        # brute force expected map: first <=3 positions of EVERY k-mer
        exp = {}
        for n in range(len(s) - 5 + 1):
            exp.setdefault(encode_str(s[n : n + 5]), []).append(n + 5)
        exp = {k: v[:3] for k, v in exp.items()}
        for k_, v_ in exp.items():
            assert list(km.get(k_, ())) == v_
        # a 50x-repeated k-mer keeps its first 3 positions
        assert len(km.get(encode_str("ACGTA"), ())) == 3
        # absent k-mer
        assert km.get(encode_str("AAAAA"), ()) == ()
    finally:
        os.unlink(path)


def test_lazyseq_matches_string():
    from ska_tpu.skalo.kmer_utils import LazySeq

    head = "ACTGACT"
    tail = np.array([0, 1, 2, 3, 2, 1, 0, 3], np.uint8)  # A C T G T C A G
    ls = LazySeq(head, tail_codes=tail)
    full = head + "ACTGTCAG"
    assert len(ls) == len(full)
    assert str(ls) == full
    ls2 = LazySeq(head, tail_codes=tail.copy())
    for i in range(len(full)):
        assert ls2[i] == full[i]
    assert ls2[-3] == full[-3]
    for a, b in [(0, 4), (3, 11), (8, 15), (0, len(full)), (5, 5), (-6, -1)]:
        assert ls2[a:b] == full[a:b], (a, b)
    # parts-based construction: codes of ALL nodes, first dropped
    parts = [np.array([3, 0], np.uint8), np.array([1, 2, 3], np.uint8)]
    ls3 = LazySeq("TTT", parts=parts, n=5)
    assert str(ls3) == "TTT" + "ACTG"[0] + "ACTG"[1] + "ACTG"[2] + "ACTG"[3]
    assert len(ls3) == 7


def test_native_map_lookup_matches_numpy():
    """csrc ska_map_lookup == searchsorted + exact-row-compare for both
    limb widths, including miss-below/miss-above/adjacent-miss needles
    (the `ska map` host-mode dict lookup, ska_ref.rs:508-533)."""
    pytest.importorskip("ska_tpu.io.native")
    from ska_tpu.io.native import map_lookup

    rng = np.random.default_rng(7)
    for W in (1, 2):
        tbl = np.unique(
            rng.integers(0, 1 << 62, (4096, W), dtype=np.uint64), axis=0
        )
        order = np.lexsort([tbl[:, i] for i in range(W - 1, -1, -1)])
        tbl = tbl[order]
        needles = np.concatenate(
            [
                tbl[::5],                       # exact hits
                tbl[1::7] + np.uint64(1),       # adjacent misses
                np.zeros((1, W), np.uint64),    # below-range
                np.full((1, W), np.uint64(~np.uint64(0))),  # above-range
                rng.integers(0, 1 << 62, (1024, W), dtype=np.uint64),
            ]
        )
        found, idx = map_lookup(tbl, needles)
        if W == 1:
            flat_t, flat_n = tbl[:, 0], needles[:, 0]
            lo = np.searchsorted(flat_t, flat_n)
        else:
            comb = lambda a: (a[:, 0].astype(object) << 64) | a[:, 1].astype(object)
            flat_t, flat_n = comb(tbl), comb(needles)
            lo = np.searchsorted(flat_t, flat_n)
        lo_c = np.clip(lo, 0, len(tbl) - 1)
        exp_found = np.all(tbl[lo_c] == needles, axis=-1)
        assert np.array_equal(found, exp_found), W
        assert np.array_equal(idx[found], lo_c[exp_found]), W


def test_native_map_lookup_threaded_invariant(monkeypatch):
    """SKA_THREADS does not change lookup results (needle-range split,
    disjoint outputs)."""
    pytest.importorskip("ska_tpu.io.native")
    from ska_tpu.io.native import map_lookup

    rng = np.random.default_rng(3)
    tbl = np.sort(
        np.unique(rng.integers(0, 1 << 60, 100_000, dtype=np.uint64))
    )[:, None]
    needles = rng.integers(0, 1 << 60, (80_000, 1), dtype=np.uint64)
    f1, i1 = map_lookup(tbl, needles)
    monkeypatch.setenv("SKA_THREADS", "4")
    f4, i4 = map_lookup(tbl, needles)
    assert np.array_equal(f1, f4)
    assert np.array_equal(i1[f1], i4[f4])


def test_sorted_view_identity_fast_path():
    """Already-sorted keys (every .skf this framework writes) return
    perm=None — no argsort, no arange; unsorted keys still argsort."""
    from ska_tpu.array import SkaArray
    from ska_tpu.ops import npkeys

    keys = np.array([[1], [2], [5], [9]], np.uint64)
    arr = SkaArray(
        k=31, rc=True, names=["a"],
        keys=keys, variants=np.full((4, 1), ord("A"), np.uint8),
        counts=np.ones(4, np.int64),
    )
    sk, perm = arr.sorted_view()
    assert perm is None
    # zero-copy alias of self.keys, returned non-writeable so a caller
    # mutation cannot silently corrupt the SkaArray (ADVICE r4)
    assert sk.base is keys and not sk.flags.writeable
    assert np.shares_memory(sk, keys)
    assert npkeys.np_lex_is_sorted(keys)

    arr.keys = keys[::-1].copy()
    sk2, perm2 = arr.sorted_view()
    assert perm2 is not None
    assert np.array_equal(sk2[:, 0], np.sort(keys[:, 0]))
    assert not npkeys.np_lex_is_sorted(arr.keys)

    # two-limb lexicographic order: hi ties broken by lo
    two = np.array([[1, 9], [2, 0], [2, 1], [3, 0]], np.uint64)
    assert npkeys.np_lex_is_sorted(two)
    assert not npkeys.np_lex_is_sorted(two[[0, 2, 1, 3]])


@pytest.mark.parametrize("W", [1, 2])
def test_native_map_gather_fused(W, monkeypatch):
    """csrc ska_map_gather == map_lookup + numpy gather/RC chain
    (ska_ref.rs:508-533 lookup + :520-526 RC_IUPAC translation),
    across widths, sort permutations and thread counts."""
    from ska_tpu.encoding import RC_IUPAC
    from ska_tpu.io.native import map_gather, map_lookup

    rng = np.random.default_rng(11 + W)
    for trial in range(8):
        n = int(rng.integers(0, 3000))
        m = int(rng.integers(0, 5000))
        S = int(rng.integers(1, 7))
        pool = rng.integers(0, 1 << 62, size=(max(n, 1) * 2, W),
                            dtype=np.uint64)
        if trial % 3 == 0:
            # collapse the top 16 bits: many keys share one prefix
            # bucket, exercising the in-bucket binary search
            pool[:, 0] &= np.uint64(0x0000FFFFFFFFFFFF)
        keys = np.unique(pool, axis=0)[:n]
        n = len(keys)
        variants = rng.integers(0, 256, size=(n, S), dtype=np.uint8)
        if n and m:
            needles = keys[rng.integers(0, n, size=m)].copy()
            miss = rng.random(m) < 0.4
            needles[miss] = rng.integers(
                0, 1 << 62, size=(int(miss.sum()), W), dtype=np.uint64)
        else:
            needles = rng.integers(0, 1 << 62, size=(m, W), dtype=np.uint64)
        krc = rng.random(m) < 0.5
        perm = storage = None
        if trial % 2:
            perm = rng.permutation(n).astype(np.int64)
            storage = np.empty_like(variants)
            storage[perm] = variants  # storage row perm[i] = sorted row i

        if n:
            found, idx = map_lookup(keys, needles)
            hit_ref = np.nonzero(found)[0]
            hidx = idx[hit_ref]
            rows_ref = variants[hidx]
            rows_ref = np.where(krc[hit_ref][:, None],
                                RC_IUPAC[rows_ref], rows_ref)
        else:
            hit_ref = np.zeros(0, np.int64)
            rows_ref = np.zeros((0, S), np.uint8)

        for T in ("1", "3"):
            monkeypatch.setenv("SKA_THREADS", T)
            hit, rows = map_gather(
                keys, needles, krc,
                variants if perm is None else storage, RC_IUPAC, perm)
            assert np.array_equal(hit, hit_ref), (W, trial, T)
            assert np.array_equal(rows, rows_ref), (W, trial, T)
