"""Tests for the Pallas bitonic sort engine (ops/sort.py).

On the CPU test mesh the TPU kernels run under pallas interpret mode
(interpret=True), exercising the exact network/index logic that executes
on hardware; sort_ops' default path on CPU is the lax.sort fallback.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ska_tpu.ops import sort as S


def _check_multiset(ops_in, ops_out):
    a1 = sorted(zip(*[np.asarray(o).reshape(-1).tolist() for o in ops_in]))
    a2 = sorted(zip(*[np.asarray(o).reshape(-1).tolist() for o in ops_out]))
    assert a1 == a2


@pytest.mark.parametrize("L", [1 << 13, 1 << 14, 1 << 15])
def test_interpret_u64_keys_with_payload(L):
    rng = np.random.default_rng(7)
    B = 2
    # many duplicates to stress tie handling
    x = rng.integers(0, 97, size=(B, L), dtype=np.uint64) * np.uint64(
        0x9E3779B97F4A7C15
    )
    pay = rng.integers(0, 2**31, size=(B, L), dtype=np.int32)
    got = S.sort_ops((jnp.asarray(x), jnp.asarray(pay)), num_keys=1, interpret=True)
    gk = np.asarray(got[0])
    assert (gk == np.sort(x, axis=-1)).all()
    for b in range(B):
        _check_multiset((x[b], pay[b]), (gk[b], np.asarray(got[1])[b]))


def test_interpret_two_limb_keys_bool_payload():
    rng = np.random.default_rng(3)
    L = 1 << 13
    hi = rng.integers(0, 3, size=L, dtype=np.uint64)
    lo = rng.integers(0, 2**63, size=L, dtype=np.uint64)
    em = rng.integers(0, 2, size=L).astype(bool)
    got = S.sort_ops(
        (jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(em)), num_keys=2, interpret=True
    )
    _check_multiset((hi, lo, em), got)
    gh, gl = np.asarray(got[0]), np.asarray(got[1])
    order = np.lexsort((lo, hi))
    assert (gh == hi[order]).all() and (gl == lo[order]).all()


def test_fallback_non_pow2_matches_lax():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**63, size=(3, 1000), dtype=np.uint64)
    got = S.sort_ops((jnp.asarray(x),), num_keys=1)
    assert (np.asarray(got[0]) == np.sort(x, axis=-1)).all()


def test_sentinels_sort_last():
    # the pipeline relies on 0xFF..FF rows landing at the tail
    L = 1 << 13
    rng = np.random.default_rng(2)
    x = rng.integers(0, 2**62, size=L, dtype=np.uint64)
    x[:100] = np.uint64(0xFFFFFFFFFFFFFFFF)
    got = np.asarray(S.sort_ops((jnp.asarray(x),), num_keys=1, interpret=True)[0])
    assert (got[-100:] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
    assert (got == np.sort(x)).all()
