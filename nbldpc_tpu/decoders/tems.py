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

TPU-native formulation (round 2): everything is dense [*, q, *] max
reductions and XOR permutes — no trellis pointers, no sorts, no gathers:
  - the per-row top-3 over columns is an unrolled compare/shift cascade over
    the dc slices (ties -> lower column, = stable-sort order) — no lax.top_k,
    no transposes of the minor dims;
  - data-dependent XOR permutes (delta transform by z, output rotation by
    beta ^ z_j) decompose into p conditional STATIC lane permutes
    (ems._xor_perm_dyn);
  - the two-deviation max-convolution runs as a lax.fori_loop over e1 whose
    body is O(p) static permutes — compile time is O(p), not O(q) (the
    round-1 Python-unrolled loop took 181 s to compile at q=64).
Both the q-last [B, M, dc, q] and batch-last [M, dc, q, B] layouts share the
same core.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nbldpc_tpu.decoders import common
from nbldpc_tpu.decoders.ems import _iota, _xor_perm_dyn
from nbldpc_tpu.graph import TannerGraph

NEG = -1e30


def _top3_over_dc(Ujs: list):
    """Per-row top-3 (value, column) over the dc operands (compare/shift
    cascade; ties keep the earlier = lower column, matching a stable sort).

    Ujs: dc arrays of identical shape. Returns (m1, c1, m2, c2, m3)."""
    m1 = jnp.full_like(Ujs[0], NEG)
    m2, m3 = m1, m1
    c1 = jnp.zeros_like(Ujs[0])
    c2 = c1
    for j, v in enumerate(Ujs):
        b1 = v > m1
        b2 = (v > m2) & ~b1
        b3 = (v > m3) & ~b1 & ~b2
        jf = jnp.float32(j)
        m3 = jnp.where(b1 | b2, m2, jnp.where(b3, v, m3))
        m2 = jnp.where(b1, m1, jnp.where(b2, v, m2))
        c2 = jnp.where(b1, c1, jnp.where(b2, jf, c2))
        m1 = jnp.where(b1, v, m1)
        c1 = jnp.where(b1, jf, c1)
    return m1, c1, m2, c2, m3


def _two_deviation(m1x, c1x, m2x, q: int, axis: int):
    """Best two-deviation combination per row.

    m1x, m2x: [..., q at axis, ...] best / second-best deviation per row
    c1x:      column (f32) of the best
    returns dw2: max over e1 ^ e2 = eta (e1, e2 != 0) with collision fix.

    lax.fori_loop over e1; the e2 = e1 ^ eta side is a data-dependent XOR
    permute of O(p) conditional static lane permutes — compile is O(p)."""
    iota = _iota(q, m1x.ndim, axis)

    def body(e1, dw):
        e1a = jnp.full((1,) * m1x.ndim, e1, jnp.int32)
        v1 = jnp.max(jnp.where(iota == e1, m1x, NEG), axis=axis, keepdims=True)
        v2 = jnp.max(jnp.where(iota == e1, m2x, NEG), axis=axis, keepdims=True)
        c1 = jnp.max(jnp.where(iota == e1, c1x, NEG), axis=axis, keepdims=True)
        w1 = _xor_perm_dyn(m1x, e1a, q, axis)
        w2 = _xor_perm_dyn(m2x, e1a, q, axis)
        d1 = _xor_perm_dyn(c1x, e1a, q, axis)
        cand = jnp.where(c1 == d1, jnp.maximum(v1 + w2, v2 + w1), v1 + w1)
        # invalid: e2 = 0, i.e. eta == e1 — mask that single lane
        cand = jnp.where(iota == e1, NEG, cand)
        return jnp.maximum(dw, cand)

    dw0 = jnp.full_like(m1x, NEG)
    return jax.lax.fori_loop(1, q, body, dw0)


def _cn_tems_core(Ujs: list, q: int, axis: int) -> list:
    """Shared T-EMS check-node core over one check's dc operands.

    Ujs: dc arrays [..., q at axis, ...], log-domain x-domain, normalized
    (max = 0), pad slots = log-delta0. Returns dc extrinsic outputs (before
    offset/normalize)."""
    dc = len(Ujs)
    assert dc >= 3, "T-EMS top-3 scheme needs dc_max >= 3"
    iota = _iota(q, Ujs[0].ndim, axis)

    # delta domain relative to the most reliable symbol per edge; pad slots
    # are log-delta0 whose argmax is 0, so they pass through unchanged and
    # contribute NEG rows to the top-3 (never winning) and 0 to beta.
    zs, dUs = [], []
    for u in Ujs:
        z = jnp.argmax(u, axis=axis, keepdims=True).astype(jnp.int32)
        zs.append(z)
        dUs.append(_xor_perm_dyn(u, z, q, axis))
    beta = functools.reduce(jnp.bitwise_xor, zs)          # [..., 1, ...]

    m1, c1, m2, c2, m3 = _top3_over_dc(dUs)

    outs = []
    for j, (z, dU) in enumerate(zip(zs, dUs)):
        jf = jnp.float32(j)
        is_j0 = c1 == jf
        is_j1 = c2 == jf
        m1x = jnp.where(is_j0, m2, m1)
        c1x = jnp.where(is_j0, c2, c1)
        m2x = jnp.where(is_j0 | is_j1, m3, m2)
        dw = _two_deviation(m1x, c1x, m2x, q, axis)
        dw = jnp.maximum(dw, m1x)                         # one deviation
        dw = jnp.where(iota == 0, 0.0, dw)                # zero deviations
        # back to the normal domain: C_j(a) = dW(a ^ beta ^ z_j)
        outs.append(_xor_perm_dyn(dw, beta ^ z, q, axis))
    return outs


def tems_cn_update(U: jnp.ndarray, graph: TannerGraph, offset: float = 0.0) -> jnp.ndarray:
    """Check-node update, x-domain in/out: [B, M, dc_max, q] log-domain.
    GF permutations live in the routing gathers (graph.gather_*_x)."""
    q = graph.q
    mask = graph.cn_mask[None, :, :, None]                # [1, M, dc, 1]
    U = U - jnp.max(U, axis=-1, keepdims=True)
    d0 = jnp.full((q,), NEG, U.dtype).at[0].set(0.0)
    U = jnp.where(mask, U, d0)                            # pads: identity
    Ujs = [U[:, :, j, :] for j in range(graph.dc_max)]
    outs = _cn_tems_core(Ujs, q, axis=-1)
    out = jnp.stack(outs, axis=2)
    out = jnp.minimum(out - jnp.max(out, axis=-1, keepdims=True) + offset, 0.0)
    return jnp.where(mask, jnp.maximum(out, NEG), 0.0)


def tems_cn_update_bl(U: jnp.ndarray, graph: TannerGraph, offset: float = 0.0) -> jnp.ndarray:
    """Batch-last CN update: U [M, dc_max, q, B] log-domain x-domain.

    Maskless: pad CN slots arrive as log-delta0 (graph.gather_cn_x_bl) —
    argmax 0, NEG deviation rows, 0 contribution to beta — and pad outputs
    are never routed by the VN gather."""
    q = graph.q
    U = U - jnp.max(U, axis=2, keepdims=True)
    Ujs = [U[:, j] for j in range(graph.dc_max)]          # [M, q, B]
    outs = _cn_tems_core(Ujs, q, axis=1)
    out = jnp.stack(outs, axis=1)
    return jnp.minimum(out - jnp.max(out, axis=2, keepdims=True) + offset, 0.0)


def decode(
    graph: TannerGraph,
    llr: jnp.ndarray,
    max_iters: int = 20,
    offset: float = 0.0,
    early_term: bool = True,
    batch_last: bool = True,
) -> common.DecodeResult:
    """T-EMS decode of a batch: llr [B, N, q] -> DecodeResult."""
    if batch_last:
        cn = functools.partial(tems_cn_update_bl, offset=offset)
        return common.decode_bl(graph, llr, cn, max_iters, early_term)
    cn = functools.partial(tems_cn_update, offset=offset)
    return common.decode(graph, llr, cn, max_iters, early_term)
