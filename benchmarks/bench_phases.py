"""Phase-level microbenchmark of the batch-last QSPA iteration on device.

Times each phase of one decode iteration separately (looped K times inside
one jit to amortize dispatch): CN update, VN gathers, VN math, syndrome,
decision. Finds where the per-iteration milliseconds actually go.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nbldpc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax
import jax.numpy as jnp

K = 20  # inner repetitions per jit call


def timed(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / K
    print(json.dumps({"phase": name, "ms_per_iter": round(dt * 1e3, 3)}))
    return dt


def main():
    from nbldpc_tpu.codegen import build_standard_code
    from nbldpc_tpu.decoders import common, qspa
    from nbldpc_tpu.graph import TannerGraph

    B = 4096 if jax.devices()[0].platform != "cpu" else 32
    spec = build_standard_code("gf16_n204_k102")
    g = TannerGraph(spec)
    q, M, N, dc, dv = g.q, g.m, g.n, g.dc_max, g.dv_max
    key = jax.random.PRNGKey(0)
    llr = jax.random.normal(key, (N, q, B), jnp.float32) * 4.0
    C = jax.random.normal(key, (M, dc, q, B), jnp.float32)
    U = jax.random.normal(key, (M, dc, q, B), jnp.float32)
    hard = jax.random.randint(key, (N, B), 0, q, dtype=jnp.int32)

    def loop(f, x):
        return jax.lax.fori_loop(0, K, lambda i, a: f(a) + 0.0 * i, x)

    timed("cn_update_bl", lambda u: loop(lambda x: qspa.qspa_cn_update_bl(x, g), u), U)
    timed("gather_vn_x_bl", lambda c: loop(lambda x: g.gather_vn_x_bl(x)[:, :, :, : x.shape[-1]].sum(1), c)
          if False else jax.lax.fori_loop(0, K, lambda i, a: g.gather_cn_x_bl(g.gather_vn_x_bl(a)), c), C)
    timed("vn_full", lambda c: jax.lax.fori_loop(
        0, K, lambda i, a: common.vn_update_bl(g, llr, a)[0], c), C)
    timed("syndrome_bl", lambda h: jax.lax.fori_loop(
        0, K, lambda i, a: (g.syndrome_bl(a).sum(0, keepdims=True) * 0 + a), h), hard)
    timed("full_body", lambda c: jax.lax.fori_loop(
        0, K, lambda i, a: qspa.qspa_cn_update_bl(common.vn_update_bl(g, llr, a)[0], g), c), C)


if __name__ == "__main__":
    main()
