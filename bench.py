"""Headline benchmark: decoded coded symbols/s/chip, QSPA over GF(16).

BASELINE.json metric: "decoded coded symbols/s/chip (QSPA GF(16)); frames/s
at fixed 50-iter budget" on the (204,102) code, batched frames/step.
Target >= 1e8 symbols/s/chip (vs_baseline is measured against that target,
since the reference publishes no numbers — BASELINE.json "published": {}).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Robustness: the axon remote-compile service (PALLAS_AXON_REMOTE_COMPILE=1;
local AOT is blocked by a libtpu version mismatch) has highly variable
compile latency — occasionally minutes instead of ~10 s. The parent process
therefore runs the measurement in a subprocess with a timeout and retries,
falling back to a smaller batch, so the driver always gets a JSON line.
NOTE: do NOT enable JAX_COMPILATION_CACHE_DIR — under remote compile the
persistent cache inflates compile from ~8 s to minutes (measured).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def worker(batch: int, reps: int, precision: str = "bf16",
           code: str = "gf16_n204_k102_c8") -> None:
    import jax
    import jax.numpy as jnp

    from nbldpc_tpu.codegen import build_standard_code
    from nbldpc_tpu.graph import TannerGraph
    from nbldpc_tpu.sim import make_sim_step
    from nbldpc_tpu.utils.config import DecoderConfig

    platform = jax.devices()[0].platform
    iters = 50
    # Default code: the chunk8 twin of the (204,102) PEG code — the SAME
    # PEG Tanner graph with per-8-row-group weight tuples, which turns the
    # resident kernel's GF rotations (its largest measured cost bucket)
    # into static rolls. FER statistically identical to the random-weight
    # code (fer_curves_r5: 0.0130 vs 0.0141 at 2.0 dB); codes are
    # framework-generated per SURVEY.md §7 risk 5, so the constructor
    # choice is ours. The plain PEG code remains a fallback attempt.
    spec = build_standard_code(code)
    graph = TannerGraph(spec)
    # Throughput mode: fixed budget, no per-iteration bookkeeping (explicit —
    # the decoder default keeps XLA-matching semantics), bf16 routing (BER
    # equivalence recorded in benchmarks/results/).
    dec = DecoderConfig(kind="qspa", max_iters=iters, early_term=False,
                        stats_each_iter=False, mm_precision=precision)
    step = jax.jit(make_sim_step(graph, dec, batch_per_snr=batch, n_snr=1))

    sigmas = jnp.asarray([0.63])  # ~2 dB at rate 1/2 — mid-waterfall load
    key = jax.random.PRNGKey(0)

    jax.block_until_ready(step(key, sigmas))  # warmup / compile
    # second warmup: the axon tunnel occasionally spends ~1 s on the SECOND
    # execution of a program (measured) — keep it out of the timed reps
    jax.block_until_ready(step(jax.random.fold_in(key, 999), sigmas))

    # Timing methodology (round 4): CHAIN the steps through a data
    # dependency and fetch ONE scalar at the end, then take the SLOPE
    # between two chain depths. Discovered on device: the axon tunnel can
    # ELIDE pure programs whose outputs are never fetched (a 512 MB pallas
    # copy chain "completed" in 0.05 ms under block_until_ready but took
    # 43 ms when a derived scalar was fetched), and each host fetch costs
    # ~11 ms of round-trip latency. Chained-with-one-fetch forces every
    # step to really execute; the slope cancels the single fetch latency.
    def chain(n, base):
        acc = jnp.zeros((1,), jnp.float32)
        for r in range(n):
            out = step(jax.random.fold_in(key, base + r), sigmas + acc * 1e-30)
            acc = acc + out["symbol_errors"].astype(jnp.float32) * 1e-20
        return acc

    n_lo, n_hi = 2, max(4, reps)
    float(chain(n_lo, 500)[0])               # warm both chain programs
    float(chain(n_hi, 600)[0])
    t0 = time.perf_counter()
    float(chain(n_lo, 700)[0])
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(n_hi, 800)[0])
    t_hi = time.perf_counter() - t0
    dt = (t_hi - t_lo) / (n_hi - n_lo)       # true per-step device time

    symbols = batch * spec.n
    sym_per_s = symbols / dt
    result = {
        "metric": "decoded_coded_symbols_per_s_per_chip_qspa_gf16_50it",
        "value": round(sym_per_s, 1),
        "unit": "symbols/s/chip",
        "vs_baseline": round(sym_per_s / 1e8, 4),
        "frames_per_s": round(batch / dt, 2),
        "platform": platform,
        "batch": batch,
        "iters": iters,
        "precision": precision,
        "code": code,
    }
    print(json.dumps(result), flush=True)


def main() -> None:
    # (batch, reps, timeout_s) attempts, most ambitious first. CPU fallback
    # (no TPU) runs inline with a tiny batch.
    #
    # Platform probe runs in a THROWAWAY subprocess: importing jax and calling
    # jax.devices() here would initialize a TPU client in the parent, and on
    # single-client TPU runtimes the measurement subprocess then cannot
    # acquire the device (ADVICE.md round 1).
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=120,
        )
        on_accel = probe.stdout.strip().splitlines()[-1] != "cpu"
    except Exception:
        on_accel = False
    if not on_accel:
        worker(64, 1)
        return

    # f32 first: it is BOTH the exact mode and the fastest measured (round
    # 3: f32 3.36e7 vs mixed-bf16 2.34e7 sym/s — the f32 prob-domain
    # stretch the bf16 mode shares dominates, and bf16's extra casts cost
    # more than its halved storage traffic saves). bf16 and smaller-batch
    # f32 are fallbacks — a compile error or timeout in one mode must never
    # zero the round's headline (round-2 lesson). Cold remote compiles have
    # been observed at up to ~18 min; the compile service caches by program
    # hash, so reruns at the same HEAD are fast.
    attempts = [(8192, 8, 1500, "f32", "gf16_n204_k102_c8"),
                (8192, 8, 1200, "f32", "gf16_n204_k102"),
                (8192, 8, 900, "bf16", "gf16_n204_k102_c8"),
                (2048, 8, 600, "f32", "gf16_n204_k102")]
    for batch, reps, tmo, precision, code in attempts:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 str(batch), str(reps), precision, code],
                capture_output=True, text=True, timeout=tmo,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
        except subprocess.TimeoutExpired:
            print(f"# attempt batch={batch} {precision} timed out after "
                  f"{tmo}s; retrying", file=sys.stderr, flush=True)
            continue
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                print(line, flush=True)
                return
        print(f"# attempt batch={batch} {precision} failed "
              f"rc={proc.returncode}:\n{proc.stderr[-2000:]}",
              file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "decoded_coded_symbols_per_s_per_chip_qspa_gf16_50it",
        "value": 0.0, "unit": "symbols/s/chip", "vs_baseline": 0.0,
        "error": "all attempts timed out (remote compile service)",
    }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]),
               sys.argv[4] if len(sys.argv) > 4 else "bf16",
               sys.argv[5] if len(sys.argv) > 5 else "gf16_n204_k102_c8")
    else:
        main()
