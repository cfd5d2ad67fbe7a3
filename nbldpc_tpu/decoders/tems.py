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

    TPU-native form: iterate e1 over the (static) GF symbols; the e2 = e1^eta
    side is then a STATIC XOR lane-permutation of eta — no dynamic gathers
    (per-element take_along_axis is ~1000x slower on TPU and was faulting
    the runtime at production batch sizes).
    """
    q = m1x.shape[-1]
    tbl = _xor_table(q)                                 # numpy, static
    dw = jnp.full_like(m1x, NEG)
    for e1 in range(1, q):
        perm = tbl[e1]                                  # eta -> e1 ^ eta
        v1 = m1x[..., e1 : e1 + 1]
        v2 = m2x[..., e1 : e1 + 1]
        c1 = c1x[..., e1 : e1 + 1]
        w1 = m1x[..., perm]
        w2 = m2x[..., perm]
        d1 = c1x[..., perm]
        cand = jnp.where(
            c1 == d1,
            jnp.maximum(v1 + w2, v2 + w1),
            v1 + w1,
        )
        # invalid: e2 = 0 (i.e. eta == e1) — mask that single static lane
        cand = jnp.where(jnp.asarray(perm == 0), NEG, cand)
        dw = jnp.maximum(dw, cand)
    return dw


def xor_permute_bits(x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Exact data-dependent XOR lane permutation: out[..., a] = x[..., a ^ z].

    z: int32, shape x.shape[:-1]. XOR-by-z decomposes into p conditional
    STATIC lane permutations (XOR by 2^i, selected by bit i of z) — pure
    data movement, bit-exact, no dynamic gathers (per-element
    take_along_axis is ~1000x slower on TPU and was faulting the runtime
    at production batch sizes).
    """
    q = x.shape[-1]
    a = np.arange(q)
    zb = z[..., None]
    for i in range(q.bit_length() - 1):
        perm = a ^ (1 << i)                              # static lane swap
        x = jnp.where((zb >> i) & 1 != 0, x[..., perm], x)
    return x


def tems_cn_update(U: jnp.ndarray, graph: TannerGraph, offset: float = 0.0) -> jnp.ndarray:
    """Check-node update, x-domain in/out: [B, M, dc_max, q] log-domain.
    GF permutations live in the routing gathers (graph.gather_*_x).

    Fully vectorized over the column axis j (no per-column Python loop) and
    gather-free: the two data-dependent XOR permutations (delta transform by
    z, output rotation by beta ^ z_j) run through `xor_permute_bits`.
    """
    q, dc = graph.q, graph.dc_max
    assert dc >= 3, "T-EMS top-3 scheme needs dc_max >= 3"
    xor_tbl = jnp.asarray(_xor_table(q))
    mask = graph.cn_mask[None, :, :, None]               # [1, M, dc, 1]

    U = U - jnp.max(U, axis=-1, keepdims=True)
    # keep values finite for the permutes; pad columns re-masked to the
    # delta0 identity afterwards (argmax of an all-zero pad row is 0, so
    # pad z = 0 and pads contribute nothing to beta)
    U = jnp.where(mask, U, 0.0)

    # delta domain relative to the most reliable symbol per edge
    z = jnp.argmax(U, axis=-1).astype(jnp.int32)         # [B, M, dc]
    dU = xor_permute_bits(U, z)                          # dU(eta) = U(eta ^ z)
    d0 = jnp.full((q,), NEG, U.dtype).at[0].set(0.0)
    dU = jnp.where(mask, dU, d0)
    beta = jax.lax.reduce(
        z, np.int32(0), jax.lax.bitwise_xor, dimensions=(2,)
    )                                                    # [B, M]

    # per-row (eta) top-3 deviations over columns
    dUt = jnp.moveaxis(dU, 2, 3)                         # [B, M, q, dc]
    t_val, t_col = jax.lax.top_k(dUt, 3)                 # [B, M, q, 3]

    # exclude column j — vectorized over j as a broadcast axis [B, M, dc, q]
    j_idx = np.arange(dc, dtype=np.int32)[None, None, :, None]
    tv = t_val[:, :, None, :, :]                         # [B, M, 1, q, 3]
    tc = t_col[:, :, None, :, :]
    is_j0 = tc[..., 0] == j_idx                          # [B, M, dc, q]
    is_j1 = tc[..., 1] == j_idx
    m1x = jnp.where(is_j0, tv[..., 1], tv[..., 0])
    c1x = jnp.where(is_j0, tc[..., 1], tc[..., 0])
    m2x = jnp.where(is_j0 | is_j1, tv[..., 2], tv[..., 1])

    dw = _two_deviation(m1x, c1x, m2x, xor_tbl)          # [B, M, dc, q]
    dw = jnp.maximum(dw, m1x)                            # one-deviation
    dw = dw.at[..., 0].set(0.0)                          # zero deviations
    # back to the normal domain: C_j(a) = dW(a ^ beta ^ z_j)
    out = xor_permute_bits(dw, beta[:, :, None] ^ z)     # [B, M, dc, q]
    out = jnp.minimum(out - jnp.max(out, axis=-1, keepdims=True) + offset, 0.0)
    return jnp.where(mask, jnp.maximum(out, NEG), 0.0)


def decode(
    graph: TannerGraph,
    llr: jnp.ndarray,
    max_iters: int = 20,
    offset: float = 0.0,
    early_term: bool = True,
) -> common.DecodeResult:
    cn = functools.partial(tems_cn_update, offset=offset)
    return common.decode(graph, llr, cn, max_iters, early_term)
