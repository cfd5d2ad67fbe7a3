"""QSPA: q-ary sum-product decoder with Hadamard-domain check-node update.

SURVEY.md C8 / §3.2: the CN update is a circular convolution over
(GF(2^p), +), computed in the Walsh–Hadamard domain:

    permute by edge weight -> softmax to prob domain -> WHT ->
    leave-one-out product over the check's dc edges -> inverse WHT ->
    clip -> log -> inverse permute

Numerics (SURVEY.md §7 hard part 2): the WHT needs prob-domain inputs but
raw products underflow over 50 iterations, so the leave-one-out product is
done in sign/log-magnitude form: per-edge WHT spectra F satisfy |F| <= 1
(F of a normalized pmf), the product over dc-1 edges is
exp(sum log|F| - log|F_e|) with an XOR-style sign product. Messages stay
log-domain between phases; each phase renormalizes.

The pure-XLA path below is the semantic reference; kernels/cn_qspa.py holds
the fused Pallas kernel (K1) with identical semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nbldpc_tpu.decoders import common
from nbldpc_tpu.graph import TannerGraph
from nbldpc_tpu.kernels.wht import wht, wht_axis

# Floor for prob-domain extrinsics before re-entering log domain. Shared with
# the numpy oracle (tests/reference_model.py) so hard decisions match.
PROB_FLOOR = 1e-12
MAG_TINY = 1e-30


def qspa_cn_update(U: jnp.ndarray, graph: TannerGraph) -> jnp.ndarray:
    """Check-node update, x-domain in and out: [B, M, dc_max, q] log-domain.

    The GF weight permutations live in the routing gathers (graph.gather_*_x),
    so this update is pure elementwise/WHT/reduction — no gathers (K1 spec).
    """
    q = graph.q
    P = jax.nn.softmax(U, axis=-1)                  # prob domain, sums to 1
    # Padding slots must be the convolution identity: delta at symbol 0
    # (WHT(delta_0) = all-ones -> multiplicative identity).
    delta0 = jnp.zeros((q,), P.dtype).at[0].set(1.0)
    P = jnp.where(graph.cn_mask[None, :, :, None], P, delta0)
    F = wht(P)                                      # [B, M, dc, q], |F| <= 1
    sign = jnp.where(F < 0, -1.0, 1.0).astype(P.dtype)
    logmag = jnp.log(jnp.abs(F) + MAG_TINY)
    # leave-one-out across the dc axis
    lsum = jnp.sum(logmag, axis=2, keepdims=True)
    ssum = jnp.prod(sign, axis=2, keepdims=True)
    G = (ssum * sign) * jnp.exp(lsum - logmag)      # sign^2 = 1 removes self
    Q = wht(G) / q                                  # inverse WHT
    Q = jnp.maximum(Q, PROB_FLOOR)
    Chat = jnp.log(Q)
    Chat = Chat - jnp.max(Chat, axis=-1, keepdims=True)
    return jnp.where(graph.cn_mask[None, :, :, None], Chat, 0.0)


def qspa_cn_update_bl(U: jnp.ndarray, graph: TannerGraph) -> jnp.ndarray:
    """Batch-last CN update: U [M, dc_max, q, B] log-domain x-domain.

    q on axis 2, frame batch on the TPU lane axis (axis 3) — every op runs
    on full 128-lane vectors.
    Identical math to qspa_cn_update — but maskless: pad CN slots arrive as
    log-delta0 (graph.gather_cn_x_bl), whose spectrum is all-ones and
    contributes exactly 0 to the leave-one-out log-sum, and pad OUTPUT values
    are never read (the VN gather routes only real slots). Pure
    elementwise + WHT + dc-reduction — the Pallas K1 contract.
    """
    q = graph.q
    P = jax.nn.softmax(U, axis=2)
    F = wht_axis(P, axis=2)                                # [M, dc, q, B]
    sign = jnp.where(F < 0, -1.0, 1.0).astype(P.dtype)
    logmag = jnp.log(jnp.abs(F) + MAG_TINY)
    lsum = jnp.sum(logmag, axis=1, keepdims=True)          # over dc
    ssum = jnp.prod(sign, axis=1, keepdims=True)
    G = (ssum * sign) * jnp.exp(lsum - logmag)
    Q = wht_axis(G, axis=2) / q
    Q = jnp.maximum(Q, PROB_FLOOR)
    Chat = jnp.log(Q)
    return Chat - jnp.max(Chat, axis=2, keepdims=True)


def qspa_cn_update_bl_pallas(U: jnp.ndarray, graph: TannerGraph) -> jnp.ndarray:
    """Fused Pallas K1 kernel path — same semantics as qspa_cn_update_bl."""
    from nbldpc_tpu.kernels.cn_qspa import cn_update_pallas

    return cn_update_pallas(U)


def _on_tpu() -> bool:
    import jax.extend.backend

    return jax.extend.backend.get_backend().platform == "tpu"


def _resident_tile(batch: int, graph: TannerGraph | None = None) -> tuple:
    """(layout, tile) for the resident kernel, or ("", 0) if none fits.

    q <= 32 (or no graph given): prefers the round-4 frames-on-lanes layout
    (tile = multiple of 128 on the lane axis — measured ~10% faster at
    GF(16) and ~15% at GF(4) than the checks-on-lanes layout, with zero
    lane padding); falls back to checks-on-lanes with a sublane tile for
    smaller batches.

    q > 32 (round-5 extension): the frames-on-lanes layout would need
    q*128 lanes per row, so large fields always use checks-on-lanes, with
    the frame tile capped by a VMEM model (~7 live [q, dc, TB, Mpad] f32
    tensors within a 90 MB budget of the chip's >= 120 MB physical VMEM)."""
    if graph is not None and graph.q > 32:
        m_pad = -(-graph.m // 128) * 128                  # lane padding
        per_tb = 7 * graph.q * graph.dc_max * m_pad * 4
        cap = max(8, (90 * 1024 * 1024 // per_tb) // 8 * 8)
        for t in range(min(batch, cap), 7, -1):
            if batch % t == 0 and t % 8 == 0:
                return "cl", t
        return "", 0
    if batch % 128 == 0:
        # tb=128 stays the tile: wider tiles (256/512) measured 8-9%
        # faster PAIR-timed at the flagship config but NEUTRAL on the
        # honest chained-slope headline and 8% SLOWER for the resident
        # EMS core (round-5 experiment; /tmp-era logs summarized in
        # ROOFLINE.md) — the pair-time gain was dispatch-side, which the
        # slope cancels anyway.
        return "fl", 128
    for t in range(min(batch, 64), 7, -1):
        if batch % t == 0 and t % 8 == 0:
            return "cl", t
    return "", 0


def _pick_impl(impl: str, graph: TannerGraph, batch: int) -> str:
    """Resolve "auto": resident kernel when it applies, else Pallas K1 on
    TPU, else pure XLA."""
    if impl != "auto":
        return impl
    if not _on_tpu():
        return "xla"
    if _resident_tile(batch, graph)[1]:
        return "resident"
    return "pallas"


def decode(
    graph: TannerGraph,
    llr: jnp.ndarray,
    max_iters: int = 20,
    early_term: bool = True,
    batch_last: bool = True,
    cn_impl: str = "auto",
    mm_precision: str = "f32",
    stats_each_iter: bool = True,
) -> common.DecodeResult:
    """QSPA decode of a batch: llr [B, N, q] -> DecodeResult.

    batch_last=True uses the TPU-fast layout (lane axis = frame batch);
    all paths implement the same BP update equations. cn_impl selects the
    implementation:
      "resident" — Pallas K0: the entire multi-iteration decode runs in one
                   VMEM-resident kernel (TPU, q <= 32; fastest by far);
      "pallas"   — Pallas K1 fused check-node kernel inside the XLA loop;
      "xla"      — pure-XLA batch-last path (CPU-runnable, semantic ref);
      "auto"     — resident when applicable, else pallas on TPU, else xla.
    The resident path runs probability-domain BP (scale-invariant, same
    fixed point); hard decisions can differ from the log-domain paths in
    rare fp-tie cases.
    """
    if batch_last:
        impl = _pick_impl(cn_impl, graph, llr.shape[0])
        layout, tb = _resident_tile(llr.shape[0], graph)
        if impl == "resident" and not tb:
            # explicitly-requested resident kernel but no tile divides the
            # batch (e.g. a prime batch size) — fall through to K1/XLA
            impl = "pallas" if _on_tpu() else "xla"
        if impl == "resident":
            from nbldpc_tpu.kernels.qspa_resident import get_resident_decoder

            mmdt = jnp.bfloat16 if mm_precision == "bf16" else jnp.float32
            dec = get_resident_decoder(graph, max_iters, early_term,
                                       stats_each_iter=stats_each_iter,
                                       mm_dtype=mmdt, layout=layout)
            hard, done, iters = dec(llr, tb=tb)
            return common.DecodeResult(hard=hard, done=done, iters=iters)
        cn = qspa_cn_update_bl_pallas if impl == "pallas" else qspa_cn_update_bl
        return common.decode_bl(graph, llr, cn, max_iters, early_term,
                                stats_each_iter=stats_each_iter)
    return common.decode(graph, llr, qspa_cn_update, max_iters, early_term)
