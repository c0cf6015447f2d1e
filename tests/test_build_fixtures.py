"""End-to-end `ska build` vs the reference's shipped .skf fixtures.

The fixtures were produced by the reference binary from the same FASTA
inputs, so key sets, middle bases and counts must match exactly
(row order differs: the reference stores hashmap order, we sort by key
and sort fixtures on load)."""

import numpy as np
import pytest

from ska_tpu.io import skf
from ska_tpu.merge import merge_samples
from ska_tpu.sample import QualOpts, build_sample


def _build_pair(ref_in, k):
    q = QualOpts()
    s1 = build_sample("test_1", k, (f"{ref_in}/test_1.fa", None), True, q)
    s2 = build_sample("test_2", k, (f"{ref_in}/test_2.fa", None), True, q)
    return merge_samples([s1, s2])


def _sorted(arr):
    from ska_tpu.ops import keys as K

    order = K.np_lex_argsort(arr.keys)
    return arr.keys[order], arr.variants[order], arr.counts[order]


@pytest.mark.parametrize("fixture,k", [("merge.skf", 17), ("merge_k9.skf", 9), ("merge_k41.skf", 41)])
def test_build_matches_fixture(ref_in, fixture, k):
    arr = _build_pair(ref_in, k)
    ref = skf.load(f"{ref_in}/{fixture}")
    assert ref.k == k
    ak, av, ac = _sorted(arr)
    rk, rv, rc_ = _sorted(ref)
    np.testing.assert_array_equal(ak, rk)
    np.testing.assert_array_equal(av, rv)
    np.testing.assert_array_equal(ac, rc_)
    assert arr.names == ref.names
    assert arr.kbits == ref.kbits


def test_skf_roundtrip(tmp_path, ref_in):
    arr = _build_pair(ref_in, 17)
    path = skf.save(arr, str(tmp_path / "out"))
    assert path.endswith(".skf")
    back = skf.load(path)
    np.testing.assert_array_equal(arr.keys, back.keys)
    np.testing.assert_array_equal(arr.variants, back.variants)
    np.testing.assert_array_equal(arr.counts, back.counts)
    assert back.names == arr.names
    assert back.k == 17 and back.rc


def test_skf_roundtrip_u128(tmp_path, ref_in):
    ref = skf.load(f"{ref_in}/merge_k41.skf")
    path = skf.save(ref, str(tmp_path / "k41"))
    back = skf.load(path)
    np.testing.assert_array_equal(ref.keys, back.keys)
    np.testing.assert_array_equal(ref.variants, back.variants)
    assert back.kbits == 128


def test_device_merge_matches_host_merge(ref_in):
    """api.build (device-side global merge) == host merge_samples path."""
    from ska_tpu.api import build

    q = QualOpts()
    files = [
        ("test_1", f"{ref_in}/test_1.fa", None),
        ("test_2", f"{ref_in}/test_2.fa", None),
    ]
    dev = build(files, 17, True, q)
    host = _build_pair(ref_in, 17)
    np.testing.assert_array_equal(dev.keys, host.keys)
    np.testing.assert_array_equal(dev.variants, host.variants)
    np.testing.assert_array_equal(dev.counts, host.counts)
    assert dev.names == host.names


def test_build_multi_bucket_column_order(tmp_path, ref_in):
    """Samples landing in different size buckets must come back in input
    column order (api.build's cross-batch union + reorder)."""
    from ska_tpu.api import build

    # sample 'big' is long enough to land in a larger power-of-two bucket
    big = tmp_path / "big.fa"
    rng = np.random.default_rng(5)
    seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=9000)
    with open(big, "wb") as f:
        f.write(b">big\n" + seq.tobytes() + b"\n")

    q = QualOpts()
    files = [
        ("test_1", f"{ref_in}/test_1.fa", None),
        ("big", str(big), None),
        ("test_2", f"{ref_in}/test_2.fa", None),
    ]
    arr = build(files, 17, True, q)
    assert arr.names == ["test_1", "big", "test_2"]

    # column content must match single-sample builds
    for col, (name, path, _) in enumerate(files):
        s = build_sample(name, 17, (path, None), True, q)
        one = merge_samples([s])
        present = arr.variants[:, col] != ord("-")
        got_keys = arr.keys[present]
        order = np.lexsort(tuple(got_keys[:, i] for i in range(got_keys.shape[1] - 1, -1, -1)))
        np.testing.assert_array_equal(got_keys[order], one.keys)


def test_cbor_writer_byte_identical_to_ciborium(ref_in):
    """Writer byte-compat proof at the CBOR layer: decode a reference
    fixture (written by ciborium in Rust), re-encode the parsed array
    through our writer's CBOR path, and compare raw payload bytes.
    (The snappy layer above it is format-valid but compressor-specific,
    so whole-file equality is not expected.)"""
    import numpy as np

    from ska_tpu.io import cbor, skf, snappy

    for fix in ("merge.skf", "merge_k9.skf", "merge_k41.skf", "test_skalo.skf"):
        path = f"{ref_in}/{fix}"
        ref_cbor = snappy.frame_decompress(open(path, "rb").read())
        arr = skf.load(path)
        keys = np.asarray(arr.keys, dtype=np.uint64)
        if keys.ndim == 1:
            keys = keys[:, None]
        kmers = (
            cbor.UInts64(keys[:, 0])
            if keys.shape[1] == 1
            else cbor.U128s(keys[:, 0], keys[:, 1])
        )
        obj = {
            "k": arr.k,
            "rc": bool(arr.rc),
            "names": list(arr.names),
            "split_kmers": kmers,
            "variants": {
                "v": 1,
                "dim": [int(arr.ksize), int(arr.nsamples)],
                "data": cbor.UInts64(arr.variants.ravel().astype(np.uint64)),
            },
            "variant_count": cbor.UInts64(np.asarray(arr.counts, dtype=np.uint64)),
            "ska_version": arr.ska_version,
            "k_bits": arr.kbits,
        }
        assert cbor.dumps(obj) == ref_cbor, fix
