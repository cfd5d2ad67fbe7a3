"""T-EMS: Trellis Extended Min-Sum decoder (delta-domain check-node update).

SURVEY.md C10 (algorithm family: Li/Declercq/Gunnam trellis-EMS): messages
are re-expressed relative to each edge's most reliable symbol z_j; the check
constraint reduces to finding, per output (column j, row a), the best
deviation path with at most two deviations:

    dW_j(eta) = max( m1x_j(eta),                                 # 1 deviation
                     max_{e1 ^ e2 = eta} dev(e1) + dev(e2) )     # 2 deviations
    C_j(a)    = dW_j(a ^ beta ^ z_j)        beta = XOR_i z_i  (syndrome symbol)

where m1x/m2x are the per-row best/second-best deviations over columns != j,
derived from a per-row top-3 (value, column) table; two-deviation column
collisions are fixed by substituting the second-best side (the standard
hardware-friendly approximation — identical in the numpy oracle, so golden
tests are exact).

TPU-native formulation: everything is dense [B, M, q] min/max reductions and
XOR-table gathers — no trellis pointers. The two-deviation max-convolution is
chunked over e1 (lax.fori_loop over q/g steps of [B, M, g, q] tensors) to
bound memory while staying vectorized (SURVEY.md C10: "dense vectorized ops").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nbldpc_tpu.decoders import common
from nbldpc_tpu.decoders.ems import _xor_table
from nbldpc_tpu.graph import TannerGraph

NEG = -1e30


def _two_deviation(m1x, c1x, m2x, xor_tbl):
    """Best two-deviation combination per row.

    m1x, m2x: [B, M, q] best / second-best deviation value per row
    c1x:      [B, M, q] column of the best
    returns dw2 [B, M, q]: max over e1^e2=eta (e1,e2 != 0) with collision fix.
    """
    q = m1x.shape[-1]
    g = max(1, min(q, 4096 // q))          # e1 chunk size (power of two)
    steps = q // g
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (1, q), 1)      # [1, q]

    def body(i, dw):
        e1 = jax.lax.dynamic_slice_in_dim(iota_q, i * g, g, 1)[0]   # [g]
        shift = xor_tbl[e1]                                         # [g, q] e1^eta
        v1 = jax.lax.dynamic_slice_in_dim(m1x, i * g, g, -1)        # [B, M, g]
        v2 = jax.lax.dynamic_slice_in_dim(m2x, i * g, g, -1)
        c1 = jax.lax.dynamic_slice_in_dim(c1x, i * g, g, -1)
        # gather the e2 = e1 ^ eta side for all eta
        sh = jnp.broadcast_to(shift, m1x.shape[:-1] + shift.shape).reshape(
            m1x.shape[:-1] + (g * q,)
        )
        w1 = jnp.take_along_axis(m1x, sh, axis=-1).reshape(m1x.shape[:-1] + (g, q))
        w2 = jnp.take_along_axis(m2x, sh, axis=-1).reshape(m1x.shape[:-1] + (g, q))
        d1 = jnp.take_along_axis(c1x, sh, axis=-1).reshape(m1x.shape[:-1] + (g, q))
        collide = c1[..., None] == d1
        cand = jnp.where(
            collide,
            jnp.maximum(v1[..., None] + w2, v2[..., None] + w1),
            v1[..., None] + w1,
        )
        # invalid: e1 = 0 (whole row), e2 = 0 (eta == e1), eta = 0
        bad = (e1[:, None] == 0) | (shift == 0) | (iota_q == 0)
        cand = jnp.where(bad, NEG, cand)
        return jnp.maximum(dw, jnp.max(cand, axis=-2))

    dw0 = jnp.full_like(m1x, NEG)
    return jax.lax.fori_loop(0, steps, body, dw0)


def tems_cn_update(U: jnp.ndarray, graph: TannerGraph, offset: float = 0.0) -> jnp.ndarray:
    """Check-node update, x-domain in/out: [B, M, dc_max, q] log-domain.
    GF permutations live in the routing gathers (graph.gather_*_x)."""
    q, dc = graph.q, graph.dc_max
    assert dc >= 3, "T-EMS top-3 scheme needs dc_max >= 3"
    xor_tbl = jnp.asarray(_xor_table(q))
    mask = graph.cn_mask[None, :, :, None]

    U = U - jnp.max(U, axis=-1, keepdims=True)
    d0 = jnp.full((q,), NEG, U.dtype).at[0].set(0.0)
    U = jnp.where(mask, U, d0)

    # delta domain relative to the most reliable symbol per edge
    z = jnp.argmax(U, axis=-1).astype(jnp.int32)        # [B, M, dc]
    dU = jnp.take_along_axis(U, xor_tbl[z], axis=-1)    # dU(eta) = U(eta ^ z)
    beta = jax.lax.reduce(
        z, np.int32(0), jax.lax.bitwise_xor, dimensions=(2,)
    )                                                    # [B, M]

    # per-row (eta) top-3 deviations over columns
    dUt = jnp.moveaxis(dU, 2, 3)                         # [B, M, q, dc]
    t_val, t_col = jax.lax.top_k(dUt, 3)                 # [B, M, q, 3]

    outs = []
    for j in range(dc):
        is_j = t_col == j
        m1x = jnp.where(is_j[..., 0], t_val[..., 1], t_val[..., 0])
        c1x = jnp.where(is_j[..., 0], t_col[..., 1], t_col[..., 0])
        m2x = jnp.where(
            is_j[..., 0] | is_j[..., 1], t_val[..., 2], t_val[..., 1]
        )
        dw = _two_deviation(m1x, c1x, m2x, xor_tbl)      # [B, M, q]
        dw = jnp.maximum(dw, m1x)                        # one-deviation
        dw = dw.at[..., 0].set(0.0)                      # zero deviations
        # back to the normal domain: C_j(a) = dW(a ^ beta ^ z_j)
        rot = xor_tbl[beta ^ z[:, :, j]]                 # [B, M, q]
        out = jnp.take_along_axis(dw, rot, axis=-1)
        out = jnp.minimum(out - jnp.max(out, axis=-1, keepdims=True) + offset, 0.0)
        outs.append(jnp.maximum(out, NEG))

    O = jnp.stack(outs, axis=2)                          # [B, M, dc, q]
    return jnp.where(mask, O, 0.0)


def decode(
    graph: TannerGraph,
    llr: jnp.ndarray,
    max_iters: int = 20,
    offset: float = 0.0,
    early_term: bool = True,
) -> common.DecodeResult:
    cn = functools.partial(tems_cn_update, offset=offset)
    return common.decode(graph, llr, cn, max_iters, early_term)
