"""WHT properties: matrix equality, involution, xor-convolution theorem."""

import numpy as np
import pytest
import jax.numpy as jnp

from nbldpc_tpu.kernels.wht import wht, iwht, wht_matrix


@pytest.mark.parametrize("q", [2, 4, 16, 64, 256])
def test_matches_dense_matrix(q):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, q)).astype(np.float32)
    H = wht_matrix(q)
    np.testing.assert_allclose(
        np.array(wht(jnp.asarray(x))), x @ H.T, rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("q", [4, 16, 64, 256])
def test_involution(q):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, q)).astype(np.float32)
    np.testing.assert_allclose(
        np.array(iwht(wht(jnp.asarray(x)))), x, rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("q", [4, 16, 64])
def test_convolution_theorem(q):
    """WHT diagonalizes xor-convolution — the QSPA CN identity."""
    rng = np.random.default_rng(2)
    p1 = rng.random(q)
    p2 = rng.random(q)
    direct = np.zeros(q)
    for b in range(q):
        for c in range(q):
            direct[b ^ c] += p1[b] * p2[c]
    via_wht = np.array(
        iwht(wht(jnp.asarray(p1)[None]) * wht(jnp.asarray(p2)[None]))
    )[0]
    np.testing.assert_allclose(via_wht, direct, rtol=1e-4, atol=1e-6)
