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
    """Unnormalized WHT along `axis` using circular rolls (Mosaic-friendly)."""
    p = q.bit_length() - 1
    shape = [1] * x.ndim
    shape[axis] = q
    a_idx = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)
    for i in range(p):
        h = 1 << i
        hi = (a_idx & h) != 0
        # pltpu.roll requires non-negative shifts: roll by -h == roll by q-h.
        partner = jnp.where(
            hi, pltpu.roll(x, h, axis=axis), pltpu.roll(x, q - h, axis=axis)
        )
        x = jnp.where(hi, partner - x, x + partner)
    return x


def _cn_kernel(u_ref, out_ref, *, q: int):
    U = u_ref[...]                                   # [TM, dc, q, TB]
    dc = U.shape[1]
    mx = jnp.max(U, axis=2, keepdims=True)
    e = jnp.exp(U - mx)
    P = e / jnp.sum(e, axis=2, keepdims=True)        # softmax over q
    F = _wht_roll(P, q)                              # spectra, |F| <= 1
    sign = jnp.where(F < 0, -1.0, 1.0).astype(P.dtype)
    logmag = jnp.log(jnp.abs(F) + MAG_TINY)
    lsum = jnp.sum(logmag, axis=1, keepdims=True)    # over dc
    # reduce_prod has no Mosaic lowering; dc is small — unroll the product
    ssum = sign[:, 0:1]
    for j in range(1, dc):
        ssum = ssum * sign[:, j : j + 1]
    G = (ssum * sign) * jnp.exp(lsum - logmag)       # leave-one-out product
    Q = _wht_roll(G, q) / q                          # inverse WHT
    Q = jnp.maximum(Q, PROB_FLOOR)
    Chat = jnp.log(Q)
    out_ref[...] = Chat - jnp.max(Chat, axis=2, keepdims=True)


def _pick_tile(n: int, target: int) -> int:
    """Largest divisor of n that is <= target (>=1)."""
    for t in range(min(n, target), 0, -1):
        if n % t == 0:
            return t
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def cn_update_pallas(U: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Fused CN update. U [M, dc, q, B] f32 log-domain x-domain -> same."""
    M, dc, q, B = U.shape
    TB = _pick_tile(B, 512)
    # Budget ~2 MiB per in-flight block (x2 buffers x in/out pipelining).
    tm_target = max(1, (2 * 1024 * 1024) // (dc * q * TB * 4))
    TM = _pick_tile(M, tm_target)
    grid = (M // TM, B // TB)
    spec = pl.BlockSpec(
        (TM, dc, q, TB), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_cn_kernel, q=q),
        out_shape=jax.ShapeDtypeStruct(U.shape, U.dtype),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )(U)
