"""Pallas K2: fused EMS sort/select check-node update (SURVEY.md §2.2 K2).

Replaces the reference genre's C++ sorted-list merges with ONE fused TPU
kernel per check-node phase: normalize -> top-nm select -> forward/backward
elementary merges -> offset correction, all in VMEM — one HBM read and one
HBM write per message per iteration.

Layout: batch-last [M, dc, q, B] (q on sublanes, frame batch on lanes),
maskless (pad slots arrive as log-delta0, the merge identity — see
graph.gather_cn_x_bl).

The algorithm is decoders/ems.py::_cn_ems_core verbatim — the classic
truncated-list EMS with exact stable top-nm extraction — parameterized by
the XOR-permute hook: Mosaic has no static gather, so the static single-bit
XOR permutes along the q (sublane) axis are expressed with `pltpu.roll` +
an iota select (the identity x[a ^ h] == roll(x, -h)[a] for bit_h(a)=0 /
roll(x, +h)[a] for bit_h(a)=1, h a power of two — same trick as the K1
kernel's WHT butterflies). Dense merges walk Gray-code order, so every step
is exactly one single-bit permute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbldpc_tpu.decoders.ems import (
    _cn_ems_bubble_core, _cn_ems_core, _postprocess,
)


def _xor_take_roll(x: jnp.ndarray, h: int, q: int, axis: int) -> jnp.ndarray:
    """Static XOR permute along `axis` via rolls (Mosaic-friendly).

    h is decomposed into single-bit permutes; for each bit 2^i:
    x[a ^ 2^i] == roll(x, 2^i)[a] where bit_i(a) = 1, roll(x, q - 2^i)[a]
    where bit_i(a) = 0 (xor never carries across the 2h block)."""
    axis = axis % x.ndim
    shape = [1] * x.ndim
    shape[axis] = q
    a_idx = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)
    t = 0
    while (1 << t) <= h:
        s = 1 << t
        if h & s:
            hi = (a_idx & s) != 0
            x = jnp.where(
                hi, pltpu.roll(x, s, axis=axis), pltpu.roll(x, q - s, axis=axis)
            )
        t += 1
    return x


def _xor_take_concat(x: jnp.ndarray, h: int, q: int, axis: int) -> jnp.ndarray:
    """Static XOR permute along `axis` as ONE concat of block slices.

    x[a ^ h] visits contiguous runs: for block size s = lowest set bit of h,
    indices a, a+1, ..., a+s-1 map to a^h, a^h+1, ... — so the permutation
    is a concat of q/s length-s slices (ONE materialization, vs ~3 per set
    bit for the roll+select decomposition)."""
    axis = axis % x.ndim
    if h == 0:
        return x
    s = h & (-h)                                   # lowest set bit
    pieces = [
        jax.lax.slice_in_dim(x, b ^ h, (b ^ h) + s, axis=axis)
        for b in range(0, q, s)
    ]
    return jnp.concatenate(pieces, axis=axis)


def _xor_take_auto(x: jnp.ndarray, h: int, q: int, axis: int) -> jnp.ndarray:
    """Pick the cheaper lowering per shift: concat when it needs <= 16
    slices (one materialization), roll+select otherwise (small shifts on a
    long q axis would need q/s tiny slices). Measured on device (round 3,
    ems_xor_impls.py): concat wins at every shift for q = 16 (+1%) and for
    the high-bit shifts that dominate q = 256 (+11% end-to-end)."""
    if h and q // (h & (-h)) <= 16:
        return _xor_take_concat(x, h, q, axis)
    return _xor_take_roll(x, h, q, axis)


_XOR_IMPLS = {"roll": _xor_take_roll, "concat": _xor_take_concat,
              "auto": _xor_take_auto}


def _cn_kernel(u_ref, out_ref, *, q: int, nm: int, offset: float,
               xor_impl: str = "roll"):
    U = u_ref[...]                                    # [TM, dc, q, TB]
    dc = U.shape[1]
    U = U - jnp.max(U, axis=2, keepdims=True)
    Ujs = [U[:, j] for j in range(dc)]                # [TM, q, TB]
    outs = _cn_ems_core(Ujs, nm, q, axis=1, xor_take=_XOR_IMPLS[xor_impl])
    out_ref[...] = _postprocess(jnp.stack(outs, axis=1), offset, axis=2)


def _cn_kernel_bubble(u_ref, out_ref, *, q: int, nm: int, offset: float):
    """Fused BUBBLE EMS CN update (round 5): extraction, staircase merges
    and compensation scatter all in VMEM, so the nm-step extraction loops
    that dominate the XLA bubble path's HBM traffic (measured ~30 ms/iter
    at GF(256) B=512) run at VMEM bandwidth, and the merges themselves
    touch only [TM, |staircase|, TB] tensors. Algorithm verbatim
    decoders/ems.py::_cn_ems_bubble_core (already Mosaic-safe: unit-slice
    concats, iota masks — no gathers, no sorts)."""
    U = u_ref[...]                                    # [TM, dc, q, TB]
    dc = U.shape[1]
    U = U - jnp.max(U, axis=2, keepdims=True)
    Ujs = [U[:, j] for j in range(dc)]                # [TM, q, TB]
    outs = _cn_ems_bubble_core(Ujs, nm, q, axis=1, stacked=U, dc_axis=1)
    out_ref[...] = _postprocess(jnp.stack(outs, axis=1), offset, axis=2)


# Scoped-VMEM budget for tile sizing. The chip has >=120 MiB of physical
# VMEM (probed round 4 — a 120 MiB scratch compiles and runs), so the
# budget is a TUNING choice, not a hard wall: a 48 MiB budget was measured
# WORSE on device (GF(256) QSPA 1.58e6 -> 1.25e6 sym/s, EMS compile
# 23 s -> 109 s — bigger blocks stretch the unrolled Gray/WHT chains past
# what Mosaic schedules well). 12 MiB keeps the round-3-tuned tile shapes;
# the explicit vmem_limit below only de-risks models that run slightly
# over the 16 MiB compiler default.
VMEM_BUDGET = 12 * 1024 * 1024
VMEM_LIMIT = 64 * 1024 * 1024


def _pick_tile(n: int, target: int) -> int:
    """Largest divisor of n that is <= target (>=1)."""
    for t in range(min(n, target), 0, -1):
        if n % t == 0:
            return t
    return 1


def _pick_lane_tile(n: int, target: int) -> int:
    """Batch (lane-axis) tile: Mosaic requires the last block dim to be a
    multiple of 128 or the whole axis. Largest 128-multiple divisor of n
    that is <= target, else n itself (e.g. S*B = 384 must tile as 128, not
    the 192 a plain largest-divisor pick returns)."""
    best = 0
    t = 128
    while t <= min(n, target):
        if n % t == 0:
            best = t
        t += 128
    return best if best else n


@functools.partial(
    jax.jit, static_argnames=("graph", "nm", "offset", "interpret", "xor_impl")
)
def ems_cn_update_bl_pallas(
    U: jnp.ndarray,
    graph=None,
    nm: int = 16,
    offset: float = 0.0,
    interpret: bool = False,
    xor_impl: str = "auto",
) -> jnp.ndarray:
    """Fused K2 EMS CN update. U [M, dc, q, B] f32 log-domain x-domain.

    `graph` is accepted (and ignored) so the call signature matches the
    CnUpdateFn contract of decoders/common.py; pads need no masking in the
    batch-last layout (log-delta0 in, outputs never routed)."""
    M, dc, q, B = U.shape
    nm = min(nm, q)
    TB = _pick_lane_tile(B, 256)
    # Mosaic allocates every live temporary on the VMEM stack (16 MiB, no
    # spilling), and the number of simultaneously-live block-sized arrays
    # GROWS with the unrolled Gray-chain length: measured on device,
    # ~4.8 MiB of stack per [1, dc, q, TB] row at q=64 (≈37 live arrays)
    # vs ≲14 at q=16. Model live ≈ 0.7q+6 for the dense-merge path
    # (q <= 64) and ~34 for the top-nm scan path (q > 64), 12 MiB budget.
    from nbldpc_tpu.decoders.ems import DENSE_MERGE_MAX_Q

    live = (0.7 * q + 6) if q <= DENSE_MERGE_MAX_Q else 12.0
    # stack per TM row, at the PADDED tile shape: the lane axis is stored
    # padded to 128 (a B=16 call measured 55.9M of stack — 8x the naive
    # model) and the sublane axis to a multiple of 8
    tb_pad = max(128, TB)
    row_bytes = live * dc * (-(-q // 8) * 8) * tb_pad * 4 // TB
    tm_target = int(VMEM_BUDGET / (row_bytes * TB))
    if tm_target < 1:
        # even a single M-row overflows at this TB — shrink the batch tile
        # (measured on device: [1,7,256,256] blocks put 18.4M on the stack).
        # Floor the target at 128: below that _pick_lane_tile finds no
        # 128-multiple divisor and would return the WHOLE axis, yielding a
        # strictly larger block than the one that already overflowed.
        TB = _pick_lane_tile(B, max(128, int(VMEM_BUDGET / row_bytes)))
        tm_target = 1
    TM = _pick_tile(M, tm_target)
    grid = (M // TM, B // TB)
    spec = pl.BlockSpec(
        (TM, dc, q, TB), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_cn_kernel, q=q, nm=nm, offset=offset,
                          xor_impl=xor_impl),
        out_shape=jax.ShapeDtypeStruct(U.shape, U.dtype),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(U)


@functools.partial(
    jax.jit, static_argnames=("graph", "nm", "offset", "interpret")
)
def ems_cn_update_bl_bubble_pallas(
    U: jnp.ndarray,
    graph=None,
    nm: int = 16,
    offset: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused bubble-EMS CN update. U [M, dc, q, B] f32 log-domain x-domain.

    Same tiling discipline as the classic K2 wrapper; the bubble path's
    live-array count is dominated by the dc extracted lists plus one dense
    staging array per in-flight merge — far below the Gray-chain model, so
    larger M tiles fit."""
    M, dc, q, B = U.shape
    nm = min(nm, q)
    TB = _pick_lane_tile(B, 256)
    # the bubble path keeps ~dc lists + one dense staging array live —
    # a 24 MiB budget with live=8 doubles the M tile vs the classic
    # model (TM=2 at GF(256)), halving grid-step overhead
    live = 8.0
    budget = 2 * VMEM_BUDGET
    tb_pad = max(128, TB)
    row_bytes = live * dc * (-(-q // 8) * 8) * tb_pad * 4 // TB
    tm_target = int(budget / (row_bytes * TB))
    if tm_target < 1:
        TB = _pick_lane_tile(B, max(128, int(budget / row_bytes)))
        tm_target = 1
    TM = _pick_tile(M, tm_target)
    grid = (M // TM, B // TB)
    spec = pl.BlockSpec(
        (TM, dc, q, TB), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_cn_kernel_bubble, q=q, nm=nm, offset=offset),
        out_shape=jax.ShapeDtypeStruct(U.shape, U.dtype),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(U)
