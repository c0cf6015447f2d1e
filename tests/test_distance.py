"""`ska distance` byte-exact comparisons vs reference oracles."""

import io

import pytest

from ska_tpu.api import build, distance_mode
from ska_tpu.io import skf
from ska_tpu.sample import QualOpts


def _dist_out(arr, min_freq=0.0, filt_ambig=True):
    fh = io.StringIO()
    distance_mode(arr, fh, min_freq, filt_ambig)
    return fh.getvalue()


def _oracle(ref_out, name):
    with open(f"{ref_out}/{name}") as f:
        return f.read()


@pytest.mark.parametrize(
    "fixture,kwargs,oracle_name",
    [
        ("merge.skf", {}, "merge.dist.stdout"),
        ("merge_k41.skf", {}, "merge_k41.dist.stdout"),
        ("merge_k9.skf", {"filt_ambig": False}, "merge_k9.dist.stdout"),
        ("merge_k9.skf", {}, "merge_k9_no_ambig.dist.stdout"),
        ("merge_k9.skf", {"min_freq": 1.0}, "merge_k9_min_freq.dist.stdout"),
    ],
)
def test_distance_fixture_oracles(ref_in, ref_out, fixture, kwargs, oracle_name):
    arr = skf.load(f"{ref_in}/{fixture}")
    assert _dist_out(arr, **kwargs) == _oracle(ref_out, oracle_name)


@pytest.fixture(scope="module")
def multidist(ref_in):
    names = ["N_test_1", "N_test_2", "ambig_test_1", "ambig_test_2", "test_1", "test_2"]
    files = [(n, f"{ref_in}/{n}.fa", None) for n in names]
    return build(files, 9, rc=True, qual=QualOpts())


def test_multidist(multidist, ref_out):
    arr = skf.load  # noqa: F841 (shape kept close to reference test flow)
    assert _dist_out(multidist.copy_like()) == _oracle(ref_out, "multidist.stdout")


def test_multidist_minfreq(multidist, ref_out):
    assert _dist_out(multidist.copy_like(), min_freq=0.9) == _oracle(
        ref_out, "multidist.minfreq.stdout"
    )


def test_multidist_ambig(multidist, ref_out):
    assert _dist_out(multidist.copy_like(), filt_ambig=False) == _oracle(
        ref_out, "multidist.ambig.stdout"
    )
