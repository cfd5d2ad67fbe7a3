"""FER/BER waterfall curves for the five BASELINE.json configs.

Runs `run_sweep` at >= 3 SNR points per config with a frame-error-driven
stop rule and writes `benchmarks/results/fer_curves_<tag>.json` (one
record per config: per-SNR frames / BER / SER / FER / avg-iters +
throughput). This is the "matched FER curves" evidence the north-star
asks for: the JAX decoders are golden-tested frame-for-frame against the
in-repo numpy oracle (tests/test_golden*.py), and these curves record the
resulting coding performance on real hardware.

Usage: python benchmarks/fer_curves.py [--tag r3] [--only gf16]
       [--max-frames 200000] [--max-fe 150]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# BASELINE configs 1-5 (SURVEY.md §6). SNR grids bracket each code's
# waterfall (found by pilot runs); frames_per_step sized so one step is
# ~O(100 ms) on the chip.
SWEEPS = [
    ("gf4_qspa_20it", "gf4_n96_k48", dict(kind="qspa", max_iters=20),
     [1.5, 2.0, 2.5, 3.0], 2048),
    ("gf16_qspa_50it", "gf16_n204_k102", dict(kind="qspa", max_iters=50),
     [1.0, 1.5, 2.0, 2.5], 4096),
    # EMS/T-EMS offsets from benchmarks/results/offset_sweep_r4.json
    # (round-4 sweep at each config's mid-waterfall SNR)
    ("gf16_ems_nm16_20it", "gf16_n204_k102",
     dict(kind="ems", nm=16, max_iters=20, offset=0.3),
     [1.0, 1.5, 2.0, 2.5], 1024),
    ("gf64_tems_20it", "gf64_n576_k480",
     dict(kind="tems", max_iters=20, offset=2.0),
     [2.5, 3.0, 3.5, 4.0], 256),
    ("gf256_qspa_10it", "gf256_n255_k175", dict(kind="qspa", max_iters=10),
     [2.0, 2.5, 3.0], 128),
    ("gf256_ems_nm16_10it", "gf256_n255_k175",
     dict(kind="ems", nm=16, max_iters=10, offset=0.1),
     [2.0, 2.5, 3.0], 128),
    # --- round-5 variants: each must match its baseline's curve ---
    # bubble EMS vs classic EMS (same code/SNRs)
    ("gf256_ems_bubble_10it", "gf256_n255_k175",
     dict(kind="ems", nm=16, max_iters=10, offset=0.0, ems_merge="bubble"),
     [2.0, 2.5, 3.0], 128),
    # truncated-deviation T-EMS vs the exact scan
    ("gf64_tems_nr8_20it", "gf64_n576_k480",
     dict(kind="tems", max_iters=20, offset=2.0, tems_nr=8),
     [2.5, 3.0, 3.5, 4.0], 256),
    ("gf64_tems_nr6_20it", "gf64_n576_k480",
     dict(kind="tems", max_iters=20, offset=2.0, tems_nr=6),
     [2.5, 3.0, 3.5, 4.0], 256),
    ("gf64_tems_nr4_20it", "gf64_n576_k480",
     dict(kind="tems", max_iters=20, offset=2.0, tems_nr=4),
     [2.5, 3.0, 3.5, 4.0], 256),
    # QC codes vs the PEG codes (same shape/decoder/SNRs)
    ("gf16_qspa_qc_slot_50it", "gf16_n204_k102_qc",
     dict(kind="qspa", max_iters=50),
     [1.0, 1.5, 2.0, 2.5], 4096),
    ("gf4_qspa_qc_20it", "gf4_n96_k48_qc",
     dict(kind="qspa", max_iters=20),
     [1.5, 2.0, 2.5, 3.0], 2048),
    # chunk8 PEG codes (same PEG graph, grouped weight tuples) vs random
    ("gf16_qspa_c8_50it", "gf16_n204_k102_c8",
     dict(kind="qspa", max_iters=50),
     [1.0, 1.5, 2.0, 2.5], 4096),
    ("gf4_qspa_c8_20it", "gf4_n96_k48_c8",
     dict(kind="qspa", max_iters=20),
     [1.5, 2.0, 2.5, 3.0], 2048),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r3")
    ap.add_argument("--only", default=None)
    ap.add_argument("--max-frames", type=int, default=200_000)
    ap.add_argument("--max-fe", type=int, default=150)
    args = ap.parse_args()

    from nbldpc_tpu.sim import run_sweep
    from nbldpc_tpu.utils.config import (
        ChannelConfig, CodeConfig, DecoderConfig, RunConfig, SimConfig,
    )
    from nbldpc_tpu.utils.report import sweep_report

    records = []
    for name, code, deckw, snrs, batch in SWEEPS:
        if args.only and args.only not in name:
            continue
        cfg = RunConfig(
            code=CodeConfig(name=code),
            decoder=DecoderConfig(early_term=True, **deckw),
            channel=ChannelConfig(ebn0_db=tuple(snrs)),
            sim=SimConfig(frames_per_step=batch,
                          max_frames=args.max_frames,
                          max_frame_errors=args.max_fe, seed=0),
        )
        res = run_sweep(cfg)
        rep = {"config": name, "code": code, **sweep_report(res)}
        del rep["config_hash"]
        records.append(rep)
        print(json.dumps(rep), flush=True)
        print(res.table(), file=sys.stderr, flush=True)
        # write incrementally, merging by config name: one failing config
        # must not lose the rest, and --only reruns update in place
        out = Path(__file__).parent / "results" / f"fer_curves_{args.tag}.json"
        out.parent.mkdir(exist_ok=True)
        merged = {}
        if out.exists():
            merged = {r["config"]: r for r in json.loads(out.read_text())}
        merged.update({r["config"]: r for r in records})
        order = [s[0] for s in SWEEPS]
        out.write_text(json.dumps(
            [merged[n] for n in order if n in merged], indent=2))

    print(f"wrote fer_curves_{args.tag}.json", file=sys.stderr)


if __name__ == "__main__":
    main()
