"""Headline benchmark: decoded coded symbols/s/chip, QSPA over GF(16).

BASELINE.json metric: "decoded coded symbols/s/chip (QSPA GF(16)); frames/s
at fixed 50-iter budget" on the (204,102) code, batched 4k frames/step.
Target >= 1e8 symbols/s/chip (vs_baseline is measured against that target,
since the reference publishes no numbers — BASELINE.json "published": {}).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

# NOTE: do NOT enable JAX_COMPILATION_CACHE_DIR here. Under the axon
# remote-compile tunnel the persistent cache serializes executables through
# the RPC layer and inflates compile from ~8s to many minutes (measured
# 70s at batch 64; unbounded at batch 16k) — it hung the whole benchmark.

import jax
import jax.numpy as jnp


def main() -> None:
    from nbldpc_tpu.codegen import build_standard_code
    from nbldpc_tpu.graph import TannerGraph
    from nbldpc_tpu.sim import make_sim_step
    from nbldpc_tpu.utils.config import DecoderConfig

    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)
    # Big batch = more device work per dispatch: the remote-TPU tunnel caps
    # dispatch rate at ~15/s, so small steps under-utilize the chip. 16k
    # frames x 50 iters is ~130 ms of device work per step — tunnel-proof.
    # (Production sweeps batch the same way; per-step state is just counters.)
    batch = 16384 if on_accel else 64
    iters = 50
    reps = 8 if on_accel else 1

    spec = build_standard_code("gf16_n204_k102")
    graph = TannerGraph(spec)
    dec = DecoderConfig(kind="qspa", max_iters=iters, early_term=False)
    step = jax.jit(make_sim_step(graph, dec, batch_per_snr=batch, n_snr=1))

    sigmas = jnp.asarray([0.63])  # ~2 dB at rate 1/2 — mid-waterfall load
    key = jax.random.PRNGKey(0)

    # warmup / compile
    out = step(key, sigmas)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for r in range(reps):
        out = step(jax.random.fold_in(key, r), sigmas)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    frames = batch * reps
    symbols = frames * spec.n
    sym_per_s = symbols / dt
    result = {
        "metric": "decoded_coded_symbols_per_s_per_chip_qspa_gf16_50it",
        "value": round(sym_per_s, 1),
        "unit": "symbols/s/chip",
        "vs_baseline": round(sym_per_s / 1e8, 4),
        "frames_per_s": round(frames / dt, 2),
        "platform": platform,
        "batch": batch,
        "iters": iters,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
