"""Device mesh + sharding specs for the ('snr', 'data') layout.

BASELINE.json north-star: "codewords x SNR points on the mesh axes ... a
single compiled decoder kernel serves all SNR points". Frames within one SNR
point shard over 'data'; distinct SNR points shard over 'snr'. Error-counter
reduction over frames is the only cross-device communication (a per-step
psum of a few ints per SNR point), which is what makes >=90% multi-host
scaling structural rather than tuned (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(snr: int = 1, data: int = 0, devices=None) -> Mesh:
    """Build a 2-D ('snr', 'data') mesh.

    snr: devices along the SNR axis; data: devices along the frame axis
    (0 = all remaining). Works on any backend, including the 8-virtual-CPU
    test configuration (SURVEY.md §4.6).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    total = devices.size
    if data == 0:
        if total % snr:
            raise ValueError(f"{total} devices not divisible by snr={snr}")
        data = total // snr
    use = devices[: snr * data].reshape(snr, data)
    return Mesh(use, ("snr", "data"))


def sim_shardings(mesh: Mesh):
    """NamedShardings for the sim step: inputs [S, B, ...] and counters [S].

    "batch" is applied inside make_sim_step via with_sharding_constraint to
    the internal frame tensors (DP contract enforced by construction;
    tests/test_mesh.py asserts the compiled sharding spans 'data')."""
    return {
        "batch": NamedSharding(mesh, P("snr", "data")),   # [S, B, ...]
        "per_snr": NamedSharding(mesh, P("snr")),         # sigma, counters [S]
        "replicated": NamedSharding(mesh, P()),
    }


def pad_to_multiple(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult
