"""K2 EMS kernel xor-permute implementation comparison (roll vs concat).

The dense Gray-scan merge does one static single-bit XOR permute along the
q (sublane) axis per step; this harness times the two Mosaic lowerings —
roll+iota-select vs one concat of block slices — through the FULL jitted
EMS decode (fixed budget), per BASELINE configs 3 (GF(16) nm=16) and the
GF(256) nm=16 entry.

Usage: python benchmarks/ems_xor_impls.py [--impls roll,concat]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


CASES = [
    ("gf16_ems_nm16_20it", "gf16_n204_k102", 16, 20, 1024),
    ("gf256_ems_nm16_10it", "gf256_n255_k175", 16, 10, 128),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="roll,concat")
    ap.add_argument("--only", default=None)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    from nbldpc_tpu.codegen import build_standard_code
    from nbldpc_tpu.decoders import common
    from nbldpc_tpu.graph import TannerGraph
    from nbldpc_tpu.kernels.cn_ems import ems_cn_update_bl_pallas

    for name, code, nm, iters, B in CASES:
        if args.only and args.only not in name:
            continue
        spec = build_standard_code(code)
        graph = TannerGraph(spec)
        llr = jax.random.normal(
            jax.random.PRNGKey(0), (B, spec.n, spec.q), jnp.float32
        ) * 4.0
        for impl in args.impls.split(","):
            try:
                cn = functools.partial(
                    ems_cn_update_bl_pallas, nm=nm, xor_impl=impl
                )
                fn = jax.jit(
                    lambda x, c=cn: common.decode_bl(
                        graph, x, c, iters, early_term=False
                    )
                )
                t0 = time.perf_counter()
                jax.block_until_ready(fn(llr))
                compile_s = time.perf_counter() - t0
                times = []
                for _ in range(max(1, args.reps // 2)):
                    t0 = time.perf_counter()
                    jax.block_until_ready([fn(llr), fn(llr)])
                    times.append((time.perf_counter() - t0) / 2)
                best = min(times)
                print(json.dumps({
                    "case": name, "xor_impl": impl,
                    "sym_per_s_best": round(B * spec.n / best, 1),
                    "step_ms_best": round(best * 1e3, 2),
                    "compile_s": round(compile_s, 1),
                }), flush=True)
            except Exception as e:  # noqa: BLE001 — report and keep sweeping
                print(json.dumps({
                    "case": name, "xor_impl": impl,
                    "error": f"{type(e).__name__}: {str(e)[:300]}",
                }), flush=True)


if __name__ == "__main__":
    main()
