"""Decode-only microbenchmark: compare QSPA paths on the current device.

Usage: python benchmarks/bench_decode.py [--batch 4096] [--iters 50]
Reports symbols/s for each decode variant on the GF(16) (204,102) code.
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nbldpc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax
import jax.numpy as jnp


def bench_one(name, fn, llr, reps):
    out = fn(llr)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(llr)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return name, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--code", default="gf16_n204_k102")
    ap.add_argument("--variants", default="bl,ql")
    args = ap.parse_args()

    from nbldpc_tpu.codegen import build_standard_code
    from nbldpc_tpu.decoders import qspa
    from nbldpc_tpu.graph import TannerGraph

    platform = jax.devices()[0].platform
    B = args.batch or (4096 if platform != "cpu" else 32)
    spec = build_standard_code(args.code)
    graph = TannerGraph(spec)
    key = jax.random.PRNGKey(0)
    llr = jax.random.normal(key, (B, spec.n, spec.q), jnp.float32) * 4.0

    variants = {}
    if "bl" in args.variants:
        variants["qspa_batch_last"] = jax.jit(
            lambda x: qspa.decode(graph, x, args.iters, early_term=False, batch_last=True)
        )
    if "ql" in args.variants:
        variants["qspa_q_last"] = jax.jit(
            lambda x: qspa.decode(graph, x, args.iters, early_term=False, batch_last=False)
        )

    for name, fn in variants.items():
        n, dt = bench_one(name, fn, llr, args.reps)
        syms = B * spec.n / dt
        print(json.dumps({
            "variant": n, "sec_per_call": round(dt, 4),
            "symbols_per_s": round(syms, 1), "platform": platform,
            "batch": B, "iters": args.iters,
        }))


if __name__ == "__main__":
    main()
