"""Microbenchmark: frames-on-lanes layout candidates for the K0 kernel.

Round-4 layout repack (VERDICT item 1): the old resident layout
[q, dc, TB, M] puts checks on the 128-lane axis (M=102 -> 128 pad = 20%
wasted VPU work; GF(4) M=48 -> 2.7x). The candidate layout [q, dc, M, TB]
puts frames on lanes (TB=128) and checks on sublanes (102 -> 104 pad, 2%).

What this measures, each as a standalone Pallas kernel looped ITERS times:

  elem_old / elem_new   the rotation+softmax elementwise chain (the measured
                        ~70% of the step) in each layout, per-frame
  route_*               candidate lowerings of the routing contraction in the
                        new layout, where dot_general's output-order rule
                        (batch, lhs_free, rhs_free) forbids a q-leading
                        output without a fix-up step:
      r3_id      rank-3 dot + identity-matmul fix-up (MXU transpose)
      r3_tr      rank-3 dot + jnp.transpose fix-up (VPU relayout)
      rep        q-replicated one-hot operator, batched dot (no fix-up,
                 costs q x operator VMEM)
  route_old             the shipped layout's 2D-reshape routing, for scale

Usage: python benchmarks/micro_layout.py [--iters 50] [--reps 6]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q, DC, M, N, TB_NEW, TB_OLD = 16, 4, 102, 204, 128, 64
ROT_BITS = 4


def _rot_chain(X, RB, rot_bits, L):
    """The conditional-roll rotation + softmax chain (layout-agnostic: all
    ops slice the leading q axis and broadcast RB over the frame axis)."""
    Z = X[1:]
    one = jnp.asarray(1.0, X.dtype)
    for t in range(rot_bits):
        s = (1 << t) % L
        rolled = jnp.concatenate([Z[L - s:], Z[: L - s]], axis=0)
        b = RB[t].astype(X.dtype)
        Z = Z * (one - b) + rolled * b
    X = jnp.concatenate([X[:1], Z], axis=0)
    Ex = jnp.exp(X)
    return Ex / jnp.sum(Ex, axis=0, keepdims=True)


def make_elem(shape, rb_shape, iters):
    def kernel(x_ref, rb_ref, o_ref):
        RB = rb_ref[...]

        def body(_, X):
            return _rot_chain(X, RB, ROT_BITS, Q - 1) - 0.5

        o_ref[...] = jax.lax.fori_loop(0, iters, body, x_ref[...])

    def run(x, rb):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(x, rb)

    return run


def make_route(variant, iters, wd, wrep, iq):
    """Loop: post -> down-route -> reduce back to a post-shaped tensor."""
    dcm = DC * M

    def kernel(post_ref, wd_ref, *rest):
        # pallas_call passes OUTPUT refs after all input refs
        o_ref, extra = rest[-1], rest[:-1]
        Wd = wd_ref[...]

        def down(post):
            if variant == "rep":
                Wr = extra[0][...]                       # [q, dcM, N]
                return jax.lax.dot_general(
                    Wr, post, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [q, dcM, TB]
            tmp = jax.lax.dot_general(
                Wd, post, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [dcM, q, TB]
            if variant == "r3_id":
                Iq = extra[0][...]
                return jax.lax.dot_general(
                    Iq, tmp, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [q, dcM, TB]
            return jnp.transpose(tmp, (1, 0, 2))

        def up(lc):
            return jax.lax.dot_general(
                Wd, lc, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [N, q, TB]

        def body(_, post):
            lc = down(post) * 0.999
            pn = up(lc)                                   # [N, q, TB]
            return _fix(pn, post)

        def _fix(pn, post):
            # post layout is [q, N, TB]; up() yields [N, q, TB] -> one more
            # identity-contract to restore q-leading, same trick as r3_id
            if variant == "rep":
                Iq = extra[1][...]
            elif variant == "r3_id":
                Iq = extra[0][...]
            else:
                return jnp.transpose(pn, (1, 0, 2)) * 0.5 + post * 0.5
            fixed = jax.lax.dot_general(
                Iq, pn, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [q, N, TB]
            return fixed * 0.5 + post * 0.5

        o_ref[...] = jax.lax.fori_loop(0, iters, body, post_ref[...])

    extras = []
    if variant == "r3_id":
        extras = [iq]
    elif variant == "rep":
        extras = [wrep, iq]

    def run(post):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Q, N, TB_NEW), jnp.float32),
        )(post, wd, *extras)

    return run, extras


def make_route_old(iters, e_list):
    """The shipped layout's routing for calibration: post [q, TB, N],
    per-j 2D-reshaped matmuls (q*TB rows)."""
    def kernel(post_ref, e_ref, o_ref):
        E = e_ref[...]                                    # [dc, N, M]

        def body(_, post):
            p2 = post.reshape(Q * TB_OLD, N)
            lc = jnp.stack(
                [jax.lax.dot_general(
                    p2, E[j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(Q, TB_OLD, M)
                 for j in range(DC)], axis=1) * 0.999     # [q, dc, TB, M]
            acc = None
            for j in range(DC):
                r = jax.lax.dot_general(
                    lc[:, j].reshape(Q * TB_OLD, M), E[j],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = r if acc is None else acc + r
            return acc.reshape(Q, TB_OLD, N) * 0.5 + post * 0.5

        o_ref[...] = jax.lax.fori_loop(0, iters, body, post_ref[...])

    def run(post):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Q, TB_OLD, N), jnp.float32),
        )(post, e_list)

    return run


def _time(fn, args, reps):
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(max(1, reps // 2)):
        t0 = time.perf_counter()
        jax.block_until_ready([fn(*args), fn(*args)])
        times.append((time.perf_counter() - t0) / 2)
    return min(times)


def bench_slope(make_fn, args, reps, frames, i1, i2):
    """Time at two loop depths; the slope cancels the axon dispatch floor
    (~6-13 ms/call even for trivial kernels — measured)."""
    t1 = _time(jax.jit(make_fn(i1)), args, reps)
    t2 = _time(jax.jit(make_fn(i2)), args, reps)
    per_iter = (t2 - t1) / (i2 - i1)
    return {"ms_low": round(t1 * 1e3, 3), "ms_high": round(t2 * 1e3, 3),
            "us_per_iter": round(per_iter * 1e6, 3),
            "ns_per_frame_iter": round(per_iter * 1e9 / frames, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    dcm = DC * M
    # one-hot routing operator: each edge slot e=(j*M+m) -> a random vn
    vn = rng.integers(0, N, size=dcm)
    wd = np.zeros((dcm, N), np.float32)
    wd[np.arange(dcm), vn] = 1.0
    wd = jnp.asarray(wd)
    wrep = jnp.asarray(np.broadcast_to(wd[None], (Q, dcm, N)).copy())
    iq = jnp.asarray(np.eye(Q, dtype=np.float32))
    e_list = np.zeros((DC, N, M), np.float32)
    for j in range(DC):
        for m in range(M):
            e_list[j, vn[j * M + m], m] = 1.0
    e_list = jnp.asarray(e_list)

    key = jax.random.PRNGKey(0)
    post_new = jax.random.normal(key, (Q, N, TB_NEW), jnp.float32)
    post_old = jax.random.normal(key, (Q, TB_OLD, N), jnp.float32)
    x_new = jax.random.normal(key, (Q, DC, M, TB_NEW), jnp.float32) - 1.0
    x_old = jax.random.normal(key, (Q, DC, TB_OLD, M), jnp.float32) - 1.0
    rb_new = jnp.asarray(
        rng.integers(0, 2, size=(ROT_BITS, DC, M, 1)).astype(np.float32))
    rb_old = jnp.asarray(
        rng.integers(0, 2, size=(ROT_BITS, DC, 1, M)).astype(np.float32))

    cases = {}
    cases["elem_new"] = (
        lambda it: make_elem((Q, DC, M, TB_NEW), rb_new.shape, it),
        (x_new, rb_new), TB_NEW)
    cases["elem_old"] = (
        lambda it: make_elem((Q, DC, TB_OLD, M), rb_old.shape, it),
        (x_old, rb_old), TB_OLD)
    for v in ("r3_id", "r3_tr", "rep"):
        cases[f"route_{v}"] = (
            lambda it, v=v: make_route(v, it, wd, wrep, iq)[0],
            (post_new,), TB_NEW)
    cases["route_old"] = (
        lambda it: make_route_old(it, e_list), (post_old,), TB_OLD)

    i1, i2 = args.iters, 4 * args.iters
    for name, (mk, a, frames) in cases.items():
        if args.only and args.only not in name:
            continue
        try:
            t0 = time.perf_counter()
            r = bench_slope(mk, a, args.reps, frames, i1, i2)
            r["compile_s"] = round(time.perf_counter() - t0, 1)
            r["case"] = name
        except Exception as e:  # noqa: BLE001
            r = {"case": name, "error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
