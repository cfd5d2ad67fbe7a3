"""Pallas K5: fused T-EMS trellis check-node update.

Replaces the reference genre's C++ delta-trellis loops (SURVEY.md C10) with
ONE fused TPU kernel per check-node phase: normalize -> delta transform ->
top-3 over columns -> dense Gray-scan two-deviation max-convolution ->
output rotation -> offset correction, all in VMEM — one HBM read and one
HBM write per message per iteration.

Layout: batch-last [M, dc, q, B] (q on sublanes, frame batch on lanes),
maskless (pad slots arrive as log-delta0 — see graph.gather_cn_x_bl).

The algorithm is decoders/tems.py::_cn_tems_core verbatim, parameterized by
the XOR-permute hook: the static single-bit XOR permutes along the q
(sublane) axis are expressed with `pltpu.roll` + an iota select, exactly as
in the K1/K2 kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbldpc_tpu.decoders.tems import _cn_tems_core
from nbldpc_tpu.kernels.cn_ems import (
    VMEM_BUDGET, VMEM_LIMIT, _pick_lane_tile, _pick_tile, _xor_take_auto,
)


def _cn_kernel(u_ref, out_ref, *, q: int, offset: float, n_r: int):
    U = u_ref[...]                                    # [TM, dc, q, TB]
    U = U - jnp.max(U, axis=2, keepdims=True)
    out = _cn_tems_core(U, q, dc_axis=1, q_axis=2, xor_take=_xor_take_auto,
                        n_r=n_r)
    out_ref[...] = jnp.minimum(
        out - jnp.max(out, axis=2, keepdims=True) + offset, 0.0
    )


@functools.partial(
    jax.jit, static_argnames=("graph", "offset", "n_r", "interpret")
)
def tems_cn_update_bl_pallas(
    U: jnp.ndarray,
    graph=None,
    offset: float = 0.0,
    n_r: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused T-EMS CN update. U [M, dc, q, B] f32 log-domain x-domain.

    `graph` is accepted (and ignored) so the call signature matches the
    CnUpdateFn contract of decoders/common.py; pads need no masking in the
    batch-last layout (log-delta0 in, outputs never routed)."""
    M, dc, q, B = U.shape
    TB = _pick_lane_tile(B, 128)
    # Mosaic allocates every live temporary on the VMEM stack (16 MiB, no
    # spilling), and the live-array count grows with the unrolled Gray-scan
    # length: measured ~3.15 MiB stack per [1, dc, q, TB] row at q=64
    # (≈24 live arrays) vs ≲10 at q=16. Model live ≈ 0.4q+6, 12 MiB budget.
    # truncated-deviation mode keeps only ~n_r list rows + dw live instead
    # of the Gray scan's O(q) shifted operands
    live = (0.4 * q + 6) if n_r == 0 else min(0.4 * q + 6, 1.5 * n_r + 10)
    # stack per TM row at the PADDED tile shape (lane axis stores as >=128,
    # sublanes as a multiple of 8 — see cn_ems.py)
    tb_pad = max(128, TB)
    row_bytes = live * dc * (-(-q // 8) * 8) * tb_pad * 4 // TB
    tm_target = int(VMEM_BUDGET / (row_bytes * TB))
    if tm_target < 1:
        # even a single M-row overflows at this TB — shrink the batch tile
        # (target floored at 128: below that _pick_lane_tile returns the
        # whole axis, a strictly LARGER block — see cn_ems.py)
        TB = _pick_lane_tile(B, max(128, int(VMEM_BUDGET / row_bytes)))
        tm_target = 1
    TM = _pick_tile(M, tm_target)
    grid = (M // TM, B // TB)
    spec = pl.BlockSpec(
        (TM, dc, q, TB), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_cn_kernel, q=q, offset=offset, n_r=n_r),
        out_shape=jax.ShapeDtypeStruct(U.shape, U.dtype),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(U)
