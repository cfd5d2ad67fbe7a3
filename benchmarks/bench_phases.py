"""Phase-level microbenchmark of the batch-last QSPA iteration on device.

Times each phase of one decode_bl iteration separately (looped K times inside
one jit to amortize dispatch). Finds where the per-iteration milliseconds go.
Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_phases.py
"""

from __future__ import annotations

import json
import os
import time

# CPU-only compile cache: under the axon remote-compile service the
# persistent cache inflates compiles from seconds to minutes (bench.py
# carries the same warning), so only enable it when forced onto CPU.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nbldpc_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    from nbldpc_tpu.decoders import qspa
    from nbldpc_tpu.graph import TannerGraph
    from nbldpc_tpu.kernels.cn_qspa import cn_update_pallas

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="gf16_n204_k102")
    ap.add_argument("--batch", type=int, default=0)
    args = ap.parse_args()
    on_tpu = jax.devices()[0].platform != "cpu"
    B = args.batch or (4096 if on_tpu else 32)
    spec = build_standard_code(args.code)
    g = TannerGraph(spec)
    q, M, N, dc, dv = g.q, g.m, g.n, g.dc_max, g.dv_max
    key = jax.random.PRNGKey(0)
    llr = jax.random.normal(key, (N, q, B), jnp.float32) * 4.0
    Cv = jax.random.normal(key, (N, dv, q, B), jnp.float32)
    U = jax.random.normal(key, (M, dc, q, B), jnp.float32)
    hard = jax.random.randint(key, (N, B), 0, q, dtype=jnp.int32)

    def rep(f):
        """fori_loop wrapper keeping a data dependency through iterations."""
        def run(x):
            return jax.lax.fori_loop(0, K, lambda i, a: f(a), x)
        return run

    timed("vn_loo_norm", rep(lambda cv: (
        lambda V: V - jnp.max(V, axis=2, keepdims=True)
    )(llr[:, None] - cv)), Cv)
    timed("gather_pair", rep(lambda cv: g.gather_vn_x_bl(g.gather_cn_x_bl(cv))), Cv)
    timed("cn_xla", rep(lambda u: qspa.qspa_cn_update_bl(u, g)), U)
    if on_tpu:
        timed("cn_pallas", rep(lambda u: cn_update_pallas(u)), U)
    timed("posterior_argmax", rep(lambda cv: cv.at[:, 0].add(
        (llr + jnp.sum(cv, axis=1)) * 0.0
    )), Cv)
    timed("syndrome", rep(lambda h: h ^ (g.syndrome_bl(h).sum(0, keepdims=True) * 0)), hard)

    def full(cv):
        Vv = llr[:, None] - cv
        Vv = Vv - jnp.max(Vv, axis=2, keepdims=True)
        Uu = g.gather_cn_x_bl(Vv)
        Chat = cn_update_pallas(Uu) if on_tpu else qspa.qspa_cn_update_bl(Uu, g)
        return g.gather_vn_x_bl(Chat)

    timed("full_body_no_dec", rep(full), Cv)


if __name__ == "__main__":
    main()
