"""Pallas kernel tests (SURVEY.md §4.5): interpret-mode differential checks
against the pure-XLA batch-last implementations, which are themselves
golden-tested against the numpy oracle. On-device equality runs under
NBLDPC_TPU_TESTS=1 (the `tpu` marker)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nbldpc_tpu.codegen import make_peg_code
from nbldpc_tpu.decoders import qspa
from nbldpc_tpu.graph import TannerGraph
from nbldpc_tpu.kernels.cn_qspa import cn_update_pallas


def _random_u(graph, B, seed=0):
    """x-domain CN inputs with correct pad structure (via the real gather)."""
    key = jax.random.PRNGKey(seed)
    Vv = jax.random.normal(
        key, (graph.n, graph.dv_max, graph.q, B), jnp.float32
    ) * 3.0
    return jax.jit(graph.gather_cn_x_bl)(Vv)


@pytest.mark.parametrize("q,n,m", [(4, 12, 6), (16, 16, 8), (64, 12, 6)])
def test_cn_kernel_interpret_matches_xla(q, n, m):
    spec = make_peg_code(n, m, q, dv=2, seed=3)
    g = TannerGraph(spec)
    U = _random_u(g, B=8)
    ref = jax.jit(lambda u: qspa.qspa_cn_update_bl(u, g))(U)
    out = cn_update_pallas(U, interpret=True)
    mask = np.array(g.cn_mask_np)[:, :, None, None]
    np.testing.assert_allclose(
        np.where(mask, np.array(out), 0.0),
        np.where(mask, np.array(ref), 0.0),
        rtol=1e-5,
        atol=1e-5,
    )


@pytest.mark.tpu
def test_cn_kernel_device_matches_xla():
    spec = make_peg_code(204, 102, 16, dv=2, seed=1)
    g = TannerGraph(spec)
    U = _random_u(g, B=256)
    ref = jax.jit(lambda u: qspa.qspa_cn_update_bl(u, g))(U)
    out = cn_update_pallas(U)
    mask = np.array(g.cn_mask_np)[:, :, None, None]
    np.testing.assert_allclose(
        np.where(mask, np.array(out), 0.0),
        np.where(mask, np.array(ref), 0.0),
        rtol=1e-4,
        atol=1e-4,
    )
