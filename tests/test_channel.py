"""Channel: sigma formula, modulation, LLR init vs direct Gaussian loglik."""

import numpy as np
import jax
import jax.numpy as jnp

from nbldpc_tpu.channel import awgn, ebn0_to_sigma, llr_init, modulate, perfect_llr
from nbldpc_tpu.gf import get_field


def test_sigma_formula():
    # R=1/2, Eb/N0 = 0 dB -> sigma^2 = 1/(2*0.5*1) = 1
    assert np.isclose(float(ebn0_to_sigma(0.0, 0.5)), 1.0)
    # higher SNR -> smaller sigma
    assert float(ebn0_to_sigma(6.0, 0.5)) < float(ebn0_to_sigma(2.0, 0.5))


def test_modulate_binary_image():
    q = 16
    gf = get_field(q)
    syms = jnp.asarray([[0, 1, 5, 15]], dtype=jnp.int32)
    x = np.array(modulate(syms, q))
    assert x.shape == (1, 4, 4)
    np.testing.assert_array_equal(x[0, 0], [1, 1, 1, 1])       # symbol 0
    np.testing.assert_array_equal(x[0, 3], [-1, -1, -1, -1])   # symbol 15
    np.testing.assert_array_equal(x[0, 2], 1 - 2 * gf.bits[5])


def test_llr_vs_direct_gaussian():
    """llr_init must equal per-symbol Gaussian log-likelihood up to a
    per-position additive constant."""
    q, sigma = 16, 0.7
    gf = get_field(q)
    rng = np.random.default_rng(0)
    y = rng.normal(size=(2, 5, gf.p)).astype(np.float32)
    llr = np.array(llr_init(jnp.asarray(y), sigma, q))
    for b in range(2):
        for n in range(5):
            direct = np.array(
                [
                    -np.sum((y[b, n] - (1 - 2 * gf.bits[a])) ** 2) / (2 * sigma**2)
                    for a in range(q)
                ]
            )
            d = llr[b, n] - direct
            np.testing.assert_allclose(d - d[0], 0.0, atol=2e-3)  # f32 einsum


def test_awgn_statistics():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((200, 100))
    y = np.array(awgn(key, x, 0.5))
    assert abs(y.mean()) < 0.01
    assert abs(y.std() - 0.5) < 0.01


def test_perfect_llr_argmax():
    cw = jnp.asarray([[3, 0, 7]], dtype=jnp.int32)
    llr = perfect_llr(cw, 8)
    np.testing.assert_array_equal(np.argmax(np.array(llr), -1), [[3, 0, 7]])
