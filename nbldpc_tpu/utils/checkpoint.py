"""Checkpoint/resume for Monte-Carlo sweeps (SURVEY.md §5.3/§5.4).

The entire sim state is tiny and mergeable: (macro-batch cursor, per-SNR
counters). Frames are i.i.d. and batch t's PRNG key is fold_in(seed, t), so
resuming from (t, counters) is exact — not just exact-in-distribution.
Writes are atomic (tmp + rename) and stamped with the config hash; a hash
mismatch refuses to resume.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

import numpy as np


class Checkpointer:
    def __init__(self, path, config_hash: str):
        self.path = Path(path)
        self.config_hash = config_hash

    def save(self, step: int, counters) -> None:
        import jax

        if jax.process_index() != 0:
            return
        payload = {
            "config_hash": self.config_hash,
            "step": int(step),
            "counters": counters.asdict(),
        }
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(payload))
        os.replace(tmp, self.path)

    def load(self) -> Optional[tuple]:
        from nbldpc_tpu.sim import Counters

        if not self.path.exists():
            return None
        payload = json.loads(self.path.read_text())
        if payload["config_hash"] != self.config_hash:
            raise ValueError(
                f"checkpoint {self.path} was written by a different config "
                f"({payload['config_hash']} != {self.config_hash})"
            )
        raw = payload["counters"]
        s = len(raw["frames"])
        c = Counters.zeros(s)
        for k, v in raw.items():
            getattr(c, k)[...] = np.asarray(v, np.int64)
        return payload["step"], c
