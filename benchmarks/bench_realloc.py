"""A/B measurement of finished-SNR slot reallocation (VERDICT r3 item 9).

Runs the same wide 8-point GF(16) QSPA sweep twice — with the
reallocation on (default) and disabled via NBLDPC_NO_SLOT_REALLOC=1 —
and records wall time, steps, and per-point frames. The sweep's SNR grid
spans deep-waterfall to error-floor points, so stop times are strongly
heterogeneous: without reallocation, early-finished points burn device
time until the slowest point's frame-error target is met.

Writes benchmarks/results/realloc_<tag>.json.
Usage: python benchmarks/bench_realloc.py [--tag r4] [--max-fe 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(disable: bool, max_fe: int, max_frames: int):
    from nbldpc_tpu.sim import run_sweep
    from nbldpc_tpu.utils.config import (
        ChannelConfig, CodeConfig, DecoderConfig, RunConfig, SimConfig,
    )

    if disable:
        os.environ["NBLDPC_NO_SLOT_REALLOC"] = "1"
    else:
        os.environ.pop("NBLDPC_NO_SLOT_REALLOC", None)
    cfg = RunConfig(
        code=CodeConfig(name="gf16_n204_k102"),
        decoder=DecoderConfig(kind="qspa", max_iters=50),
        channel=ChannelConfig(
            ebn0_db=(0.5, 1.0, 1.25, 1.5, 1.75, 2.0, 2.25, 2.5)),
        sim=SimConfig(frames_per_step=512, max_frames=max_frames,
                      max_frame_errors=max_fe, seed=3),
    )
    res = run_sweep(cfg)
    return {
        "realloc": not disable,
        "wall_s": round(res.wall_seconds, 2),
        "steps": res.steps,
        "frames": res.counters.frames.tolist(),
        "frame_errors": res.counters.frame_errors.tolist(),
        "fer": [float(f) for f in res.fer],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r4")
    ap.add_argument("--max-fe", type=int, default=100)
    ap.add_argument("--max-frames", type=int, default=400_000)
    args = ap.parse_args()

    recs = []
    for disable in (True, False):
        r = run_once(disable, args.max_fe, args.max_frames)
        recs.append(r)
        print(json.dumps(r), flush=True)
    speedup = recs[0]["wall_s"] / max(recs[1]["wall_s"], 1e-9)
    out = {"runs": recs, "speedup": round(speedup, 2)}
    outdir = Path(__file__).parent / "results"
    outdir.mkdir(exist_ok=True)
    (outdir / f"realloc_{args.tag}.json").write_text(
        json.dumps(out, indent=2))
    print(json.dumps({"speedup": out["speedup"]}), flush=True)


if __name__ == "__main__":
    main()
