"""Device extraction kernel vs the brute-force oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from ska_tpu.io import fastx
from ska_tpu.ops import extract as X
from ska_tpu.ops import keys as K

import oracle


def _random_seq(rng, n, with_n=True):
    bases = b"ACGTacgt" + (b"Nn" if with_n else b"")
    return bytes(rng.choice(list(bases), size=n).tolist())


def _run_extract(records, k, rc):
    batch = fastx.build_batch(records)
    L = len(batch.seq)
    W = K.width_for_k(k)
    valid = ((batch.seq & 0xF) != 14) & (batch.seq != 0)
    res = X.extract_windows(
        jnp.asarray(batch.seq),
        jnp.asarray(valid),
        jnp.asarray(batch.rec_last),
        k,
        rc,
        W,
        want_whole=True,
    )
    emit = np.asarray(res["emit"])
    keys = np.asarray(res["key"])
    mids = np.asarray(res["mid"])
    pals = np.asarray(res["pal"])
    wholes = np.asarray(res["whole"])
    got = []
    gotw = []
    for i in np.nonzero(emit)[0]:
        kk = int(keys[i, 0]) if W == 1 else (int(keys[i, 0]) << 64) | int(keys[i, 1])
        ww = int(wholes[i, 0]) if W == 1 else (int(wholes[i, 0]) << 64) | int(wholes[i, 1])
        got.append((int(i), kk, int(mids[i]), bool(pals[i])))
        gotw.append((int(i), ww))
    return got, gotw


@pytest.mark.parametrize("k", [5, 7, 17, 31, 33, 41, 63])
@pytest.mark.parametrize("rc", [True, False])
def test_extract_matches_oracle(k, rc):
    rng = np.random.default_rng(k * 100 + rc)
    records = [
        _random_seq(rng, n)
        for n in [0, 1, k - 1, k, k + 1, k + 2, 2 * k, 200, 500]
    ]
    got, gotw = _run_extract(records, k, rc)

    want = []
    wantw = []
    offset = 0
    for seq in records:
        for (s, key, mid, _isrc, pal) in oracle.split_kmers(seq, k, rc=rc):
            want.append((offset + s, key, mid, pal))
        for (s, w) in oracle.whole_kmers(seq, k, rc=rc):
            wantw.append((offset + s, w))
        offset += len(seq) + 1  # separator

    assert got == want
    assert gotw == wantw


def test_trailing_window_needs_roll():
    # a record of exactly length k yields nothing (build needs idx+k < L,
    # split_kmer.rs:89); length k+1 yields 2 windows; an N at position 0 of a
    # (k+1)-record kills the final window too (unreachable by rolling)
    k = 7
    got, _ = _run_extract([b"ACGTACG"], k, True)
    assert got == []
    got, _ = _run_extract([b"ACGTACGA"], k, True)
    assert len(got) == 2
    got, _ = _run_extract([b"NACGTACGA"], k, True)
    assert len(got) == 2  # build at offset 1, roll to offset 2
    # after an N break, a final window whose build would need idx+k < L
    # is unreachable: N at 3, window [4..11) ends on the last base of L=11
    got, _ = _run_extract([b"ACGNACGTACG"], k, True)
    assert got == []
    got, _ = _run_extract([b"ACGNACGTACGA"], k, True)
    assert len(got) == 2


def test_strict_quality_affects_validity():
    k = 7
    seq = b"ACGTACGTACGT"
    qual = bytearray([33 + 30] * len(seq))
    qual[5] = 33 + 10  # below threshold
    want = oracle.split_kmers(
        seq, k, rc=True, qual=bytes(qual), min_qual=20, qual_filter=oracle.QUAL_STRICT
    )
    batch = fastx.build_batch([seq], [bytes(qual)])
    valid = ((batch.seq & 0xF) != 14) & (batch.seq != 0)
    valid &= (batch.qual.astype(np.int16) - 33) > 20
    res = X.extract_windows(
        jnp.asarray(batch.seq),
        jnp.asarray(valid),
        jnp.asarray(batch.rec_last),
        k,
        True,
        1,
    )
    got_starts = np.nonzero(np.asarray(res["emit"]))[0].tolist()
    assert got_starts == [s for (s, *_rest) in want]
