"""Microbenchmarks for the fused QSPA kernel design (run on real TPU).

Questions answered (SURVEY.md §7 hard part 1 — the perm/gather strategy):
  1. How fast is a STATIC (compile-time-constant) row gather inside Pallas —
     per-edge partner routing + GF permutation as one flat constant index?
  2. How fast is the same as per-edge unrolled row moves?
  3. How fast is a one-hot routing matmul on the MXU?
  4. What does one prob-domain QSPA CN iteration cost in VMEM?

Usage: python benchmarks/micro_pallas.py [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nbldpc_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E, Q, BT = 408, 16, 128   # GF(16) (204,102) flagship shapes
ITERS = 20                # loop reps inside kernel to amortize call overhead


def bench(name, fn, *args):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    per_iter_us = dt / ITERS * 1e6
    print(f"{name:42s} {dt*1e3:8.3f} ms/call  {per_iter_us:8.2f} us/iter")
    return dt


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((E, Q, BT), dtype=np.float32))
    perm = rng.permutation(E * Q).astype(np.int32)        # combined route+perm
    return x, perm


# --- variant 1: one flat constant gather ---------------------------------
def flat_gather_kernel(x_ref, o_ref, *, idx):
    def body(i, acc):
        flat = acc.reshape(E * Q, BT)
        return flat[idx, :].reshape(E, Q, BT) + 1.0
    o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])


def run_flat_gather(x, perm, interpret):
    idx = jnp.asarray(perm)  # traced-constant; also try np for static
    return pl.pallas_call(
        functools.partial(flat_gather_kernel, idx=perm),  # numpy = static
        out_shape=jax.ShapeDtypeStruct((E, Q, BT), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


# --- variant 2: per-edge static row moves + sublane perm ------------------
def row_moves_kernel(x_ref, o_ref, *, pi, perms):
    def body(i, acc):
        outs = []
        for e in range(E):
            row = acc[pi[e]]               # [Q, BT] static partner index
            outs.append(row[perms[e], :])  # constant sublane permutation
        return jnp.stack(outs) + 1.0
    o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])


def run_row_moves(x, perm, interpret):
    pi = (perm.reshape(E, Q)[:, 0] // Q).astype(np.int32)
    perms = (perm.reshape(E, Q) % Q).astype(np.int32)
    return pl.pallas_call(
        functools.partial(row_moves_kernel, pi=pi, perms=perms),
        out_shape=jax.ShapeDtypeStruct((E, Q, BT), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


# --- variant 3: one-hot matmul routing (MXU) ------------------------------
def matmul_kernel(x_ref, a_ref, o_ref):
    def body(i, acc):
        flat = acc.reshape(E * Q // 128 * 128, -1)  # noop reshape guard
        flat = acc.reshape(E * Q, BT)
        return jnp.dot(a_ref[:], flat, preferred_element_type=jnp.float32
                       ).reshape(E, Q, BT) + 1.0
    o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])


def run_matmul(x, perm, interpret):
    A = np.zeros((E * Q, E * Q), np.float32)
    A[np.arange(E * Q), perm] = 1.0
    return pl.pallas_call(
        matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((E, Q, BT), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(A))


# --- variant 4: prob-domain CN iteration (WHT + LOO product) --------------
def cn_kernel(x_ref, o_ref):
    M, DC = E // 4, 4

    def wht(v):
        shape = v.shape
        q = shape[-2]
        p = q.bit_length() - 1
        for i in range(p):
            h = 1 << i
            y = v.reshape(shape[:-2] + (q // (2 * h), 2, h, BT))
            a = y[..., 0, :, :]
            b = y[..., 1, :, :]
            v = jnp.stack([a + b, a - b], axis=-3).reshape(shape)
        return v

    def body(i, acc):
        p = acc / (jnp.sum(acc, axis=-2, keepdims=True) + 1e-30)
        f = wht(p)
        fb = f.reshape(M, DC, Q, BT)
        # leave-one-out product via prefix/suffix (dc=4 unrolled)
        pre1 = fb[:, 0]
        pre2 = pre1 * fb[:, 1]
        pre3 = pre2 * fb[:, 2]
        suf2 = fb[:, 3]
        suf1 = suf2 * fb[:, 2]
        suf0 = suf1 * fb[:, 1]
        loo = jnp.stack([suf0, fb[:, 0] * suf1, pre2 * suf2, pre3], axis=1)
        g = wht(loo.reshape(E, Q, BT)) / Q
        return jnp.maximum(g, 1e-12)

    o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])


def run_cn(x, perm, interpret):
    return pl.pallas_call(
        cn_kernel,
        out_shape=jax.ShapeDtypeStruct((E, Q, BT), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    x, perm = make_inputs()
    runs = {
        "cn_iteration_prob_domain": run_cn,
        "flat_constant_gather": run_flat_gather,
        "matmul_onehot_routing": run_matmul,
        "per_edge_row_moves": run_row_moves,
    }
    for name, fn in runs.items():
        if args.only and args.only not in name:
            continue
        try:
            t0 = time.perf_counter()
            bench(name, lambda xx: fn(xx, perm, args.interpret), x)
            print(f"   (compile+run first call: {time.perf_counter()-t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:42s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
