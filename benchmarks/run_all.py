"""Throughput regression harness over the five BASELINE.json configs
(SURVEY.md §4.7). Writes benchmarks/results/<tag>.json, one record per
config, on whatever device JAX sees.

Usage: PYTHONPATH=. python benchmarks/run_all.py [--tag round1] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nbldpc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax
import jax.numpy as jnp

CONFIGS = [
    # name, code, decoder kwargs, iters, batch
    ("gf4_qspa_20it", "gf4_n96_k48", dict(kind="qspa"), 20, 4096),
    ("gf16_qspa_50it", "gf16_n204_k102", dict(kind="qspa"), 50, 4096),
    ("gf16_ems_nm16_20it", "gf16_n204_k102", dict(kind="ems", nm=16), 20, 1024),
    ("gf64_tems_20it", "gf64_n576_k480", dict(kind="tems"), 20, 256),
    ("gf256_qspa_10it", "gf256_n255_k175", dict(kind="qspa"), 10, 128),
    ("gf256_ems_nm16_10it", "gf256_n255_k175", dict(kind="ems", nm=16), 10, 128),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="local")
    ap.add_argument("--quick", action="store_true", help="small batches")
    ap.add_argument("--only", default=None, help="substring filter")
    args = ap.parse_args()

    from nbldpc_tpu.codegen import build_standard_code
    from nbldpc_tpu.graph import TannerGraph
    from nbldpc_tpu.sim import make_sim_step
    from nbldpc_tpu.utils.config import DecoderConfig

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    reps = 10 if on_accel else 1
    records = []
    for name, code, deckw, iters, batch in CONFIGS:
        if args.only and args.only not in name:
            continue
        if not on_accel or args.quick:
            batch = min(batch, 32)
        spec = build_standard_code(code)
        graph = TannerGraph(spec)
        dec = DecoderConfig(max_iters=iters, early_term=False, **deckw)
        step = jax.jit(make_sim_step(graph, dec, batch_per_snr=batch, n_snr=1))
        sigmas = jnp.asarray([0.7])
        key = jax.random.PRNGKey(0)
        t_c0 = time.perf_counter()
        out = step(key, sigmas)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for r in range(reps):
            out = step(jax.random.fold_in(key, r), sigmas)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rec = {
            "config": name,
            "code": code,
            "iters": iters,
            "batch": batch,
            "symbols_per_s": round(batch * reps * spec.n / dt, 1),
            "frames_per_s": round(batch * reps / dt, 2),
            "compile_s": round(compile_s, 2),
            "platform": platform,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    outdir = Path(__file__).parent / "results"
    outdir.mkdir(exist_ok=True)
    (outdir / f"{args.tag}.json").write_text(json.dumps(records, indent=2))


if __name__ == "__main__":
    main()
