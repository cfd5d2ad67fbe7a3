"""bf16-vs-f32 BER/FER comparison for the resident QSPA kernel.

The bf16 resident mode quantizes the log-domain messages (routing one-hots
and Hadamard entries stay exact) — a quantized-BP variant. This harness
measures whether that quantization costs coding performance: it runs the
same seeded Monte-Carlo sweep under both precisions and writes
benchmarks/results/ber_precision.json with per-SNR BER/SER/FER for each.

Meaningful on the TPU (the resident kernel is TPU-only; on CPU both
precisions route to the same XLA path and the comparison is vacuous —
the harness still runs for smoke-testing).

Usage: python benchmarks/ber_precision.py [--frames 20000] [--iters 50]
       [--snrs 1.0 1.5 2.0 2.5]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="gf16_n204_k102")
    ap.add_argument("--frames", type=int, default=20000)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--snrs", type=float, nargs="+",
                    default=[1.0, 1.5, 2.0, 2.5])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from nbldpc_tpu.sim import run_sweep
    from nbldpc_tpu.utils.config import (
        ChannelConfig, CodeConfig, DecoderConfig, RunConfig, SimConfig,
    )

    platform = jax.devices()[0].platform
    records = {"platform": platform, "code": args.code, "iters": args.iters,
               "snrs_db": args.snrs, "modes": {}}
    for precision in ("f32", "bf16"):
        cfg = RunConfig(
            code=CodeConfig(name=args.code),
            decoder=DecoderConfig(kind="qspa", max_iters=args.iters,
                                  early_term=False, mm_precision=precision),
            channel=ChannelConfig(ebn0_db=tuple(args.snrs)),
            sim=SimConfig(frames_per_step=args.batch,
                          max_frames=args.frames,
                          max_frame_errors=10**9, seed=0),
        )
        res = run_sweep(cfg)
        records["modes"][precision] = {
            "frames": res.counters.frames.tolist(),
            "ber": [float(x) for x in res.ber],
            "ser": [float(x) for x in res.ser],
            "fer": [float(x) for x in res.fer],
            "avg_iters": [float(x) for x in res.avg_iters],
            "wall_s": round(res.wall_seconds, 2),
        }
        print(f"== {precision} ==\n{res.table()}", flush=True)

    out = Path(args.out) if args.out else (
        Path(__file__).parent / "results" / "ber_precision.json"
    )
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(records, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
