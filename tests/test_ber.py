"""Statistical integration test (SURVEY.md §4.4, BASELINE config 1):
GF(4) (96,48), QSPA, 20 iterations, AWGN at Eb/N0 = 2.5 dB.

The JAX decoder must match the numpy oracle's hard decisions frame-for-frame
on seeded noise (strictly stronger than the Wilson-interval BER agreement the
survey asks for), and the measured BER must fall in a sane waterfall range.
Slow-marked: the oracle is deliberately loop-based.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nbldpc_tpu.channel import ebn0_to_sigma, transmit
from nbldpc_tpu.codegen import build_standard_code
from nbldpc_tpu.decoders import qspa
from nbldpc_tpu.encode import Encoder
from nbldpc_tpu.gf import get_field
from nbldpc_tpu.graph import TannerGraph

from tests.reference_model import OracleDecoder


@pytest.mark.slow
def test_gf4_96_48_qspa_2p5db_matches_oracle():
    spec = build_standard_code("gf4_n96_k48")
    g = TannerGraph(spec)
    enc = Encoder(spec)
    gf = get_field(spec.q)
    frames = 120
    sigma = float(ebn0_to_sigma(2.5, spec.k / spec.n))

    u = jax.random.randint(
        jax.random.PRNGKey(10), (frames, enc.k), 0, spec.q, dtype=jnp.int32
    )
    cw = np.array(enc.encode(u))
    llr = np.array(transmit(jax.random.PRNGKey(11), jnp.asarray(cw), sigma, spec.q))

    res = qspa.decode(g, jnp.asarray(llr), max_iters=20, early_term=True)
    hard_j = np.array(res.hard)

    oracle = OracleDecoder(spec, kind="qspa")
    popc = gf.bits.sum(axis=1)
    bit_errs_j = bit_errs_o = 0
    for b in range(frames):
        hard_o, _, _ = oracle.decode(llr[b], max_iters=20)
        np.testing.assert_array_equal(hard_j[b], hard_o, err_msg=f"frame {b}")
        bit_errs_j += int(popc[hard_j[b] ^ cw[b]].sum())
        bit_errs_o += int(popc[hard_o ^ cw[b]].sum())
    assert bit_errs_j == bit_errs_o

    ber = bit_errs_j / (frames * spec.n * gf.p)
    # 2.5 dB is mid-waterfall for this rate-1/2 code: BER must be well below
    # the uncoded ~2e-2 and (with only 120 frames) above floor-level.
    assert ber < 2e-2, f"BER {ber:.3e} unexpectedly high"
