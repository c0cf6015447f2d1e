"""Mesh-sharded build on the virtual 8-device CPU mesh vs single-sample path."""

import numpy as np

import jax

from ska_tpu.parallel import build_mesh, distributed_build, dryrun_step
from ska_tpu.sample import QualOpts, dict_from_batch
from ska_tpu.io import fastx
from ska_tpu.merge import merge_samples
from ska_tpu.sample import SampleDict


def test_dryrun_8_devices():
    assert len(jax.devices()) >= 8
    n_rows = dryrun_step(8)
    assert n_rows > 0


def test_distributed_build_matches_serial():
    rng = np.random.default_rng(42)
    n_samples, L, k = 8, 300, 17
    seqs = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=(n_samples, L))
    mesh = build_mesh(8)
    valid = (seqs & 0xF) != 14
    rec_last = np.zeros((n_samples, L), bool)
    rec_last[:, -1] = True
    keys, variants, counts, n_rows = distributed_build(seqs, valid, rec_last, k, True, mesh)

    # serial path: one SampleDict per sample, host merge
    samples = []
    for i in range(n_samples):
        batch = fastx.build_batch([seqs[i].tobytes()])
        kk, ss = dict_from_batch(batch, k, True, QualOpts(), False)
        samples.append(SampleDict(name=f"s{i}", k=k, rc=True, keys=kk, sets=ss))
    arr = merge_samples(samples)

    assert n_rows == arr.ksize
    np.testing.assert_array_equal(keys, arr.keys)
    np.testing.assert_array_equal(variants, arr.variants)
    np.testing.assert_array_equal(counts, arr.counts)
