"""Field axioms for every supported GF(2^p) (SURVEY.md §4.1)."""

import numpy as np
import pytest

from nbldpc_tpu.gf import PRIM_POLY, get_field

QS = sorted(PRIM_POLY)


@pytest.mark.parametrize("q", QS)
def test_exp_log_roundtrip(q):
    gf = get_field(q)
    for a in range(1, q):
        assert gf.exp[gf.log[a]] == a
    # exp covers all nonzero elements exactly once (primitivity)
    assert sorted(gf.exp[: q - 1]) == list(range(1, q))


@pytest.mark.parametrize("q", QS)
def test_inverse(q):
    gf = get_field(q)
    a = np.arange(1, q)
    assert np.all(gf.mul[a, gf.inv[a]] == 1)
    assert gf.inv[0] == 0


@pytest.mark.parametrize("q", QS)
def test_mul_axioms(q):
    gf = get_field(q)
    rng = np.random.default_rng(0)
    a, b, c = rng.integers(0, q, size=(3, 200))
    # commutativity, associativity
    assert np.all(gf.mul[a, b] == gf.mul[b, a])
    assert np.all(gf.mul[gf.mul[a, b], c] == gf.mul[a, gf.mul[b, c]])
    # identity / zero
    assert np.all(gf.mul[a, 1] == a)
    assert np.all(gf.mul[a, 0] == 0)
    # distributivity over xor
    assert np.all(gf.mul[a, b ^ c] == (gf.mul[a, b] ^ gf.mul[a, c]))


@pytest.mark.parametrize("q", QS)
def test_mul_is_permutation(q):
    """For h != 0, a -> h*a is a bijection (needed by the perm tables K4)."""
    gf = get_field(q)
    for h in range(1, q):
        assert sorted(gf.mul[h, np.arange(q)]) == list(range(q))


@pytest.mark.parametrize("q", QS)
def test_bits_roundtrip(q):
    gf = get_field(q)
    a = np.arange(q)
    rebuilt = (gf.bits * (1 << np.arange(gf.p))[None, :]).sum(axis=1)
    assert np.all(rebuilt == a)


def test_gf_matmul():
    gf = get_field(16)
    rng = np.random.default_rng(1)
    A = rng.integers(0, 16, (5, 7))
    B = rng.integers(0, 16, (7, 3))
    C = gf.matmul(A, B)
    # against a scalar triple loop
    for i in range(5):
        for j in range(3):
            s = 0
            for k in range(7):
                s ^= int(gf.mul[A[i, k], B[k, j]])
            assert C[i, j] == s
