"""Pallas K1: fused QSPA check-node update (SURVEY.md §2.2 K1).

Replaces the reference genre's C++ CN hot loop with ONE fused TPU kernel:
softmax -> WHT -> leave-one-out sign/log-magnitude product over dc ->
inverse WHT -> floor -> log -> renormalize, all in VMEM. One HBM read and
one HBM write per message per iteration — the speed-of-light contract.

Layout: batch-last [M, dc, q, B] (q on sublanes, frame batch on lanes).
Maskless: pad slots arrive as log-delta0 (see graph.gather_cn_x_bl), whose
spectrum contributes exactly 0 to the leave-one-out sum.

The WHT butterfly is expressed with `pltpu.roll` over the q (sublane) axis —
no reshapes of the minor dims, which Mosaic lowers poorly. Identity used:
for stage h, x[a ^ h] == roll(x, -h)[a] when bit_h(a)=0 and roll(x, +h)[a]
when bit_h(a)=1 (xor with h never carries across the 2h block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Must match decoders/qspa.py so the Pallas and XLA paths agree bitwise-ish.
PROB_FLOOR = 1e-12
MAG_TINY = 1e-30


def _wht_roll(x: jnp.ndarray, q: int, axis: int = 2) -> jnp.ndarray:
    """Unnormalized WHT along `axis` using XOR permutes (Mosaic-friendly).

    Per stage h: out[a] = x[a ^ h] + sign_h(a) * x[a] with sign_h(a) = -1
    where bit_h(a) = 1 — ONE xor-permute (concat of block slices for the
    high stages, roll+select for the low ones — kernels/cn_ems.py) plus one
    fused multiply-add, instead of the two selects of the round-2 form."""
    from nbldpc_tpu.kernels.cn_ems import _xor_take_auto

    p = q.bit_length() - 1
    shape = [1] * x.ndim
    shape[axis] = q
    a_idx = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)
    for i in range(p):
        h = 1 << i
        sign = jnp.where((a_idx & h) != 0, -1.0, 1.0).astype(x.dtype)
        x = _xor_take_auto(x, h, q, axis) + x * sign
    return x


def _cn_kernel(u_ref, *rest, q: int, wht: str = "roll"):
    if wht == "mxu":
        h_ref, out_ref = rest
    else:
        (out_ref,) = rest
    U = u_ref[...]                                   # [TM, dc, q, TB]
    TM, dc, _, TB = U.shape

    if wht == "mxu":
        # WHT as a row-batched [q, q] (x) [q, TB] contraction on the MXU —
        # the sublane q axis is the natural matmul contraction dim and the
        # batch form preserves [R, q, TB] layout with no fix-ups.
        # MEASURED DEAD END (round 4, GF(256)): at the MXU's default f32
        # emulation this runs 2.06 -> 1.74 ms/iter but leaves bf16-grade
        # absolute error on the spectra (0.15 max in the log outputs, 19%
        # of elements off — the exact failure mode that cost FER in the
        # round-3 bf16 experiments); at Precision.HIGHEST it is accurate
        # (1.6e-4 max) but 2.10 ms/iter — no faster than the rolls. The
        # flag stays for the record; "auto" resolves to rolls.
        Hrep = h_ref[...]                            # [TM*dc, q, q]

        def wht_f(X):
            X3 = X.reshape(TM * dc, q, TB)
            out = jax.lax.dot_general(
                Hrep, X3, (((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            return out.reshape(TM, dc, q, TB)
    else:
        wht_f = lambda X: _wht_roll(X, q)

    mx = jnp.max(U, axis=2, keepdims=True)
    e = jnp.exp(U - mx)
    P = e / jnp.sum(e, axis=2, keepdims=True)        # softmax over q
    F = wht_f(P)                                     # spectra, |F| <= 1
    sign = jnp.where(F < 0, -1.0, 1.0).astype(P.dtype)
    logmag = jnp.log(jnp.abs(F) + MAG_TINY)
    lsum = jnp.sum(logmag, axis=1, keepdims=True)    # over dc
    # reduce_prod has no Mosaic lowering; dc is small — unroll the product
    ssum = sign[:, 0:1]
    for j in range(1, dc):
        ssum = ssum * sign[:, j : j + 1]
    G = (ssum * sign) * jnp.exp(lsum - logmag)       # leave-one-out product
    Q = wht_f(G) / q                                 # inverse WHT
    Q = jnp.maximum(Q, PROB_FLOOR)
    Chat = jnp.log(Q)
    out_ref[...] = Chat - jnp.max(Chat, axis=2, keepdims=True)


def _pick_tile(n: int, target: int) -> int:
    """Largest divisor of n that is <= target (>=1)."""
    for t in range(min(n, target), 0, -1):
        if n % t == 0:
            return t
    return 1


@functools.partial(jax.jit, static_argnames=("interpret", "wht_impl"))
def cn_update_pallas(U: jnp.ndarray, interpret: bool = False,
                     wht_impl: str = "auto") -> jnp.ndarray:
    """Fused CN update. U [M, dc, q, B] f32 log-domain x-domain -> same.

    wht_impl: "roll" (default) = xor-permute butterflies on the VPU;
    "mxu" = row-batched [q, q] Hadamard matmuls at Precision.HIGHEST —
    measured accurate but NOT faster at GF(256) (see _cn_kernel), kept
    flag-gated for the record."""
    M, dc, q, B = U.shape
    if wht_impl == "auto":
        wht_impl = "roll"
    # Mosaic keeps ~8 block-sized temporaries live on its 16 MiB VMEM stack
    # (measured on device: 24.8 M stack for a [1,7,256,512] block = ~7
    # arrays, OOM) — bound TM*TB so 8 blocks fit in 12 MiB, shrinking TB
    # too when even a single-row block would blow the budget (large q*dc).
    from nbldpc_tpu.kernels.cn_ems import (
        VMEM_BUDGET, VMEM_LIMIT, _pick_lane_tile)

    # the 8-live model was measured for the roll-path's select chains; the
    # mxu path holds fewer temporaries, so give it 4x the tile budget
    # (fewer, larger grid steps — less per-step ramp at TM=1 shapes)
    budget = VMEM_BUDGET * (4 if wht_impl == "mxu" else 1)
    budget_elems = max(1, budget // (8 * dc * q * 4))
    # floor at 128: a sub-128 target makes _pick_lane_tile return the whole
    # axis (no 128-multiple divisor <= target), defeating the VMEM bound
    TB = _pick_lane_tile(B, max(128, min(512, budget_elems)))
    # the lane axis is stored padded to >= 128 — budget against that
    TM = _pick_tile(M, max(1, budget_elems // max(TB, 128)))
    grid = (M // TM, B // TB)
    spec = pl.BlockSpec(
        (TM, dc, q, TB), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
    )
    operands = [U]
    in_specs = [spec]
    if wht_impl == "mxu":
        from nbldpc_tpu.kernels.wht import wht_matrix

        H = jnp.asarray(wht_matrix(q), jnp.float32)
        operands.append(jnp.broadcast_to(H, (TM * dc, q, q)))
        in_specs.append(pl.BlockSpec((TM * dc, q, q), lambda i, j: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_cn_kernel, q=q, wht=wht_impl),
        out_shape=jax.ShapeDtypeStruct(U.shape, U.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*operands)
