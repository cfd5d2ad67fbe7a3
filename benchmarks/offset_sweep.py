"""Offset-correction sweep for EMS / T-EMS (VERDICT r3 item 7).

Classic truncated min-sum decoders overestimate extrinsic magnitudes; the
offset correction (DecoderConfig.offset, applied in decoders/ems.py::
_postprocess and the T-EMS equivalent) compensates. Round 3 shipped
offset=0.0 everywhere, costing e.g. 2.7x FER vs QSPA at GF(16) 2.5 dB.

This harness sweeps offset at one mid-waterfall SNR per config with a
frame-error-driven stop rule, writes
benchmarks/results/offset_sweep_<tag>.json, and prints the best offset
per config — the values shipped in configs/*.json.

Usage: python benchmarks/offset_sweep.py [--tag r4] [--only gf16]
       [--max-fe 200] [--max-frames 400000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, code, decoder kwargs, mid-waterfall SNR, frames_per_step)
CONFIGS = [
    ("gf16_ems_nm16_20it", "gf16_n204_k102",
     dict(kind="ems", nm=16, max_iters=20), 2.0, 1024),
    ("gf64_tems_20it", "gf64_n576_k480",
     dict(kind="tems", max_iters=20), 3.2, 256),
    ("gf256_ems_nm16_10it", "gf256_n255_k175",
     dict(kind="ems", nm=16, max_iters=10), 2.5, 128),
    # round-5 variants: approximation schemes need their own offsets
    ("gf256_ems_bubble_10it", "gf256_n255_k175",
     dict(kind="ems", nm=16, max_iters=10, ems_merge="bubble"), 2.5, 128),
    ("gf64_tems_nr8_20it", "gf64_n576_k480",
     dict(kind="tems", max_iters=20, tems_nr=8), 3.2, 256),
]

OFFSETS = [0.0, 0.1, 0.2, 0.3, 0.4, 0.6]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r4")
    ap.add_argument("--only", default=None)
    ap.add_argument("--max-fe", type=int, default=200)
    ap.add_argument("--max-frames", type=int, default=400_000)
    ap.add_argument("--offsets", default=None,
                    help="comma list overriding the default grid")
    args = ap.parse_args()

    from nbldpc_tpu.sim import run_sweep
    from nbldpc_tpu.utils.config import (
        ChannelConfig, CodeConfig, DecoderConfig, RunConfig, SimConfig,
    )

    offsets = ([float(x) for x in args.offsets.split(",")]
               if args.offsets else OFFSETS)
    records = []
    for name, code, deckw, snr, fps in CONFIGS:
        if args.only and args.only not in name:
            continue
        rows = []
        for off in offsets:
            cfg = RunConfig(
                code=CodeConfig(name=code),
                decoder=DecoderConfig(offset=off, **deckw),
                channel=ChannelConfig(ebn0_db=(snr,)),
                sim=SimConfig(frames_per_step=fps,
                              max_frames=args.max_frames,
                              max_frame_errors=args.max_fe,
                              seed=7),
            )
            res = run_sweep(cfg)
            rows.append({
                "offset": off,
                "frames": int(res.counters.frames[0]),
                "frame_errors": int(res.counters.frame_errors[0]),
                "fer": float(res.fer[0]),
                "ber": float(res.ber[0]),
                "avg_iters": float(res.avg_iters[0]),
            })
            print(json.dumps({"config": name, "snr_db": snr, **rows[-1]}),
                  flush=True)
        best = min(rows, key=lambda r: (r["fer"], r["ber"]))
        records.append({"config": name, "code": code, "snr_db": snr,
                        "rows": rows, "best_offset": best["offset"],
                        "best_fer": best["fer"]})
        print(json.dumps({"config": name, "best_offset": best["offset"],
                          "best_fer": best["fer"]}), flush=True)

    outdir = Path(__file__).parent / "results"
    outdir.mkdir(exist_ok=True)
    (outdir / f"offset_sweep_{args.tag}.json").write_text(
        json.dumps(records, indent=2))


if __name__ == "__main__":
    main()
