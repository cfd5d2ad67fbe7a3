"""Quantify the deviation between the two EMS check-node variants
(round-1 verdict item 8 — de-circularize the EMS oracle):

  - "classic"      : truncated-list EMS (both merge operands top-nm,
                     partials re-truncated) — what the framework implements
                     and claims parity with (decoders/ems.py).
  - "dense_forward": the round-1 variant (forward partials untruncated on
                     the gathered side — a superset of the classic
                     configuration sets, so message values are >= classic).

Runs both NUMPY oracles (tests/reference_model.py) on the same seeded
frames and records message-level deviation after one iteration plus
hard-decision/frame-error disagreement after full decodes. Writes
benchmarks/results/ems_variants.json. CPU-only; no JAX involved in the
measured decoders.

Usage: python benchmarks/ems_variants.py [--frames 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--nm", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from nbldpc_tpu.codegen import make_peg_code
    from tests.reference_model import OracleDecoder
    from tests.test_golden import _noisy_llrs

    spec = make_peg_code(48, 24, 16, dv=2, seed=9)
    results = {"code": "(48,24) GF(16) dv=2 seed=9", "nm": args.nm,
               "iters": args.iters, "points": []}

    for ebn0 in (1.5, 2.5):
        _, cw, llr = _noisy_llrs(spec, args.frames, ebn0, seed=int(ebn0 * 10))
        oc = OracleDecoder(spec, kind="ems", nm=args.nm)
        ol = OracleDecoder(spec, kind="ems_legacy", nm=args.nm)

        # message deviation after 1 iteration (first frame batch)
        dev_max = dev_mean = 0.0
        n_msg = 0
        for b in range(min(8, args.frames)):
            _, _, _, C_c = oc.decode(llr[b], 1, early_term=False,
                                     return_messages=True)
            _, _, _, C_l = ol.decode(llr[b], 1, early_term=False,
                                     return_messages=True)
            for m in range(spec.m):
                for j in range(len(spec.row_cols[m])):
                    d = np.abs(np.asarray(C_c[m][j]) - np.asarray(C_l[m][j]))
                    d = d[d < 1e29]          # ignore both-NEG slots
                    if d.size:
                        dev_max = max(dev_max, float(d.max()))
                        dev_mean += float(d.sum())
                        n_msg += d.size

        fe_c = fe_l = hard_disagree = 0
        for b in range(args.frames):
            h_c, _, _ = oc.decode(llr[b], args.iters)
            h_l, _, _ = ol.decode(llr[b], args.iters)
            fe_c += int((h_c != cw[b]).any())
            fe_l += int((h_l != cw[b]).any())
            hard_disagree += int((h_c != h_l).any())

        results["points"].append({
            "ebn0_db": ebn0,
            "frames": args.frames,
            "msg_dev_mean": round(dev_mean / max(n_msg, 1), 6),
            "msg_dev_max": round(dev_max, 6),
            "frame_errors_classic": fe_c,
            "frame_errors_dense_forward": fe_l,
            "frames_with_any_hard_disagreement": hard_disagree,
        })
        print(json.dumps(results["points"][-1]), flush=True)

    outdir = Path(__file__).parent / "results"
    outdir.mkdir(exist_ok=True)
    (outdir / "ems_variants.json").write_text(json.dumps(results, indent=2))
    print("wrote", outdir / "ems_variants.json")


if __name__ == "__main__":
    main()
