"""Mesh-scaling STRUCTURE check on the virtual-CPU mesh (BASELINE config 5).

Runs the multi-SNR GF(256) QSPA sim step — identical total work, identical
seeds — over ('snr','data') meshes of 1/2/4/8 virtual CPU devices and
asserts the per-SNR counters are IDENTICAL across every mesh shape: the
determinism contract that makes the >= 90% multi-host scaling target
structural (the only cross-device traffic is an O(#SNR)-int counter psum;
per-device decode work is embarrassingly parallel over frames).

Wall-clock on this box is NOT a scaling measurement: the virtual devices
timeshare 2 physical cores and the CPU backend serializes per-device
programs, so step times are recorded for reference only. Real-hardware
throughput for the same step is the gf256_qspa_10it_4snr entry in
round3.json (single TPU chip).

Writes benchmarks/results/scaling_r3.json and appends a record to
benchmarks/results/round3.json.

Usage: JAX_PLATFORMS=cpu python benchmarks/scaling_cpu.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_platforms", "cpu")
    from nbldpc_tpu.codegen import build_standard_code
    from nbldpc_tpu.graph import TannerGraph
    from nbldpc_tpu.parallel.mesh import make_mesh, sim_shardings
    from nbldpc_tpu.sim import make_sim_step
    from nbldpc_tpu.utils.config import DecoderConfig

    spec = build_standard_code("gf256_n255_k175")
    graph = TannerGraph(spec)
    dec = DecoderConfig(kind="qspa", max_iters=4, early_term=False,
                        stats_each_iter=False)
    S, B = 2, 16                                   # fixed TOTAL work
    sigmas = jnp.linspace(0.55, 0.75, S)
    key = jax.random.PRNGKey(0)

    rows, baseline = [], None
    for snr_ax, data_ax in ((1, 1), (1, 2), (2, 2), (2, 4)):
        mesh = make_mesh(snr=snr_ax, data=data_ax)
        sh = sim_shardings(mesh)
        step = jax.jit(
            make_sim_step(graph, dec, batch_per_snr=B, n_snr=S),
            in_shardings=(sh["replicated"], sh["per_snr"]),
            out_shardings=sh["per_snr"],
        )
        out = jax.device_get(step(key, sigmas))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        jax.block_until_ready(step(key, sigmas))
        dt = time.perf_counter() - t0
        flat = {k: np.asarray(v).tolist() for k, v in out.items()}
        if baseline is None:
            baseline = flat
        identical = flat == baseline
        assert identical, f"mesh ({snr_ax},{data_ax}) changed the counters!"
        rows.append({
            "devices": snr_ax * data_ax,
            "mesh": {"snr": snr_ax, "data": data_ax},
            "step_s": round(dt, 4),
            "counters_identical_to_1dev": identical,
        })
        print(json.dumps(rows[-1]), flush=True)

    result = {
        "physical_cores": os.cpu_count(),
        "counters": baseline,
        "rows": rows,
        "note": (
            "identical seeds + identical total work across every mesh "
            "shape produce IDENTICAL per-SNR counters (the determinism/"
            "structure contract behind the multi-host scaling target); "
            "virtual CPU devices timeshare the physical cores, so step_s "
            "is for reference, not a scaling claim"
        ),
    }
    outdir = Path(__file__).parent / "results"
    (outdir / "scaling_r3.json").write_text(json.dumps(result, indent=2))
    r3 = outdir / "round3.json"
    if r3.exists():
        recs = json.loads(r3.read_text())
        recs = [r for r in recs if r.get("config") != "scaling_cpu_mesh"]
        recs.append({
            "config": "scaling_cpu_mesh",
            "code": "gf256_n255_k175",
            "platform": "cpu-virtual",
            **{k: v for k, v in result.items() if k != "counters"},
        })
        r3.write_text(json.dumps(recs, indent=2))
    print("all mesh shapes: counters identical", file=sys.stderr)


if __name__ == "__main__":
    main()
