"""EMS: Extended Min-Sum decoder with nm-truncated configuration sets.

SURVEY.md C9: log-domain max-sum check-node update restricted to the nm most
reliable entries of each incoming message (Declercq–Fossorier / Voicila EMS).

TPU-native formulation: instead of the reference genre's sorted-list merges
(pointer-chasing, data-dependent shapes), each elementary merge is a
*scan over the top-nm entries of one operand, gathering the other operand
densely* along precomputed XOR index tables:

    out[a] = max_t ( vals[t] + acc[a ^ idx[t]] )      t in top-nm(operand)

Static shapes, nm unrolled gathers of [B, M, q] — XLA-friendly, and the exact
same semantics as the numpy oracle (tests/reference_model.py::_cn_ems):
  - inputs and backward/forward partials are truncated to their stable
    top-nm entries at every merge (ties at the threshold broken toward the
    lower GF index, matching lax.top_k's documented tie-break — the
    deterministic tie-break SURVEY.md §7 hard-part 3 calls for);
  - forward prefix stays dense on the gathered side (a superset of classic
    EMS configuration sets: never worse, still deterministic).
Offset correction: magnitudes reduced by `offset`, clamped at 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nbldpc_tpu.decoders import common
from nbldpc_tpu.graph import TannerGraph

NEG = -1e30


@functools.lru_cache(maxsize=8)
def _xor_table(q: int):
    # Cache the NUMPY table, never a jnp array: jnp.asarray inside a jit
    # trace yields a tracer, and lru_cache would leak it across traces.
    a = np.arange(q)
    return (a[:, None] ^ a[None, :]).astype(np.int32)  # [q, q]


def _delta0(q: int, dtype=jnp.float32):
    """Identity element of max-xor-convolution: 0 at symbol 0, -inf else."""
    return jnp.full((q,), NEG, dtype).at[0].set(0.0)


def _merge(acc: jnp.ndarray, operand: jnp.ndarray, nm: int, xor_tbl) -> jnp.ndarray:
    """One elementary EMS merge. acc, operand: [..., q] log-domain.

    Scans the stable top-nm entries of `operand`, gathering `acc` at
    XOR-shifted positions. Equivalent to (truncated) max-convolution over
    (GF(2^p), +).
    """
    q = operand.shape[-1]
    if nm >= q:
        return _merge_dense(acc, operand, q)
    vals, idx = jax.lax.top_k(operand, nm)            # [..., nm]
    shift = xor_tbl[idx]                               # [..., nm, q]: idx ^ a
    gathered = jnp.take_along_axis(
        acc[..., None, :], shift, axis=-1
    )                                                  # acc[a ^ idx_t]
    cand = vals[..., None] + gathered                  # [..., nm, q]
    return jnp.max(cand, axis=-2)


def _merge_dense(acc: jnp.ndarray, operand: jnp.ndarray, q: int) -> jnp.ndarray:
    """Untruncated max-convolution: out[a] = max_b operand[b] + acc[a ^ b].

    Identical semantics to _merge when nm == q (top-q keeps everything), but
    every gather has STATIC indices (an XOR lane permutation per b), which
    XLA lowers to cheap shuffles on TPU — the truncated path's per-element
    dynamic gathers are ~1000x slower there.
    """
    tbl = _xor_table(q)
    out = None
    for b in range(q):
        cand = operand[..., b : b + 1] + acc[..., tbl[b]]
        out = cand if out is None else jnp.maximum(out, cand)
    return out


def ems_cn_update(
    U: jnp.ndarray, graph: TannerGraph, nm: int = 16, offset: float = 0.0
) -> jnp.ndarray:
    """Check-node update, x-domain in/out: [B, M, dc_max, q] log-domain.
    GF permutations live in the routing gathers (graph.gather_*_x)."""
    q = graph.q
    nm = min(nm, q)
    xor_tbl = jnp.asarray(_xor_table(q))
    U = U - jnp.max(U, axis=-1, keepdims=True)
    d0 = _delta0(q, U.dtype)
    U = jnp.where(graph.cn_mask[None, :, :, None], U, d0)  # pads: merge identity

    dc = graph.dc_max
    acc0 = jnp.broadcast_to(d0, U.shape[:2] + (q,))    # [B, M, q]

    # forward prefix-exclusive partials F[j] = merge of U[0..j-1]
    def fwd(acc, u):
        return _merge(acc, u, nm, xor_tbl), acc

    _, Fs = jax.lax.scan(fwd, acc0, jnp.moveaxis(U, 2, 0))      # [dc, B, M, q]

    # backward suffix-exclusive partials B[j] = merge of U[j+1..dc-1]
    def bwd(acc, u):
        return _merge(acc, u, nm, xor_tbl), acc

    _, Bs = jax.lax.scan(bwd, acc0, jnp.moveaxis(U, 2, 0), reverse=True)

    # output: O[j] = merge(F[j] dense, top-nm of B[j])
    def out_one(f, b):
        return _merge(f, b, nm, xor_tbl)

    O = jax.vmap(out_one)(Fs, Bs)                       # [dc, B, M, q]
    O = jnp.moveaxis(O, 0, 2)                           # [B, M, dc, q]

    O = O - jnp.max(O, axis=-1, keepdims=True)
    O = jnp.maximum(jnp.minimum(O + offset, 0.0), NEG)
    return jnp.where(graph.cn_mask[None, :, :, None], O, 0.0)


def decode(
    graph: TannerGraph,
    llr: jnp.ndarray,
    max_iters: int = 20,
    nm: int = 16,
    offset: float = 0.0,
    early_term: bool = True,
) -> common.DecodeResult:
    cn = functools.partial(ems_cn_update, nm=nm, offset=offset)
    return common.decode(graph, llr, cn, max_iters, early_term)
