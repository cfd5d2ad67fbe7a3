"""Frozen dataclass configs + JSON/TOML loading + config hashing.

SURVEY.md §5.6: the reference genre uses argv flags / ini files; here the
idiomatic equivalent is frozen dataclasses parsed from TOML/JSON with CLI
overrides, and a stable config hash stamped into results and checkpoints.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from pathlib import Path
from typing import Optional, Sequence


@dataclasses.dataclass(frozen=True)
class CodeConfig:
    path: Optional[str] = None      # alist file (takes precedence)
    name: Optional[str] = None      # standard generated code name (codegen.py)

    def load(self):
        from nbldpc_tpu.code import load_alist
        from nbldpc_tpu.codegen import build_standard_code

        if self.path:
            return load_alist(self.path)
        if self.name:
            std = Path(__file__).resolve().parents[2] / "codes" / f"{self.name}.alist"
            if std.exists():
                return load_alist(std)
            return build_standard_code(self.name)
        raise ValueError("CodeConfig needs path or name")


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    kind: str = "qspa"              # qspa | ems | tems
    max_iters: int = 20
    early_term: bool = True
    nm: int = 16                    # EMS truncation
    offset: float = 0.0             # EMS/T-EMS offset correction
    ems_merge: str = "classic"      # EMS CN merge: "classic" (compensated
                                    # dense scheme) | "bubble" (list-based
                                    # staircase merges; the fast large-q
                                    # variant, own oracle + FER validation)
    tems_nr: int = 0                # T-EMS truncated-deviation rows: 0 =
                                    # exact all-row scan; n_r > 0 restricts
                                    # two-deviation pairs to the n_r most
                                    # reliable rows (fast GF(64) variant)
    mm_precision: str = "f32"       # resident-kernel message dtype:
                                    # "f32" (default; exact) | "bf16"
                                    # (half the VMEM bytes/pass; opt-in for
                                    # throughput runs — see
                                    # benchmarks/ber_precision.py for the
                                    # bf16-vs-f32 BER comparison harness)
    stats_each_iter: bool = True    # per-iteration hard/syndrome bookkeeping
                                    # in fixed-budget mode (early_term=False);
                                    # False = pure throughput mode (iters
                                    # reports max_iters, no mid-budget freeze)


@dataclasses.dataclass(frozen=True)
class ChannelConfig:
    ebn0_db: Sequence[float] = (2.5,)
    zero_codeword: bool = True      # all-zero shortcut (symmetric channel)


@dataclasses.dataclass(frozen=True)
class SimConfig:
    frames_per_step: int = 256      # per SNR point per device step
    max_frames: int = 10_000        # stop criterion per SNR point
    max_frame_errors: int = 100     # stop criterion per SNR point
    seed: int = 0
    checkpoint_path: Optional[str] = None
    checkpoint_every: int = 0       # macro-batches; 0 = off
    profile_dir: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    snr: int = 1                    # devices along the 'snr' axis
    data: int = 0                   # devices along 'data'; 0 = all remaining


@dataclasses.dataclass(frozen=True)
class RunConfig:
    code: CodeConfig = CodeConfig(name="gf16_n204_k102")
    decoder: DecoderConfig = DecoderConfig()
    channel: ChannelConfig = ChannelConfig()
    sim: SimConfig = SimConfig()
    mesh: MeshConfig = MeshConfig()

    def config_hash(self) -> str:
        return hashlib.sha256(
            json.dumps(dataclasses.asdict(self), sort_keys=True, default=list).encode()
        ).hexdigest()[:16]


def _build(cls, data: dict):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in data.items():
        if k not in fields:
            raise ValueError(f"unknown config key {cls.__name__}.{k}")
        ft = fields[k].type
        if dataclasses.is_dataclass(_RESOLVE.get(k)):
            v = _build(_RESOLVE[k], v)
        kwargs[k] = v
    return cls(**kwargs)


_RESOLVE = {
    "code": CodeConfig,
    "decoder": DecoderConfig,
    "channel": ChannelConfig,
    "sim": SimConfig,
    "mesh": MeshConfig,
}


def load_config(path) -> RunConfig:
    """Load RunConfig from a JSON or TOML file."""
    text = Path(path).read_text()
    if str(path).endswith(".toml"):
        import tomllib

        data = tomllib.loads(text)
    else:
        data = json.loads(text)
    return _build(RunConfig, data)


def apply_overrides(cfg: RunConfig, overrides: Sequence[str]) -> RunConfig:
    """Apply 'a.b=value' CLI overrides (JSON-parsed values)."""
    data = dataclasses.asdict(cfg)
    for ov in overrides:
        key, _, val = ov.partition("=")
        parts = key.split(".")
        d = data
        for i, p in enumerate(parts[:-1]):
            if p not in d:
                raise ValueError(
                    f"unknown config key {'.'.join(parts[: i + 1])!r} in override {ov!r}"
                )
            d = d[p]
        if parts[-1] not in d:
            raise ValueError(f"unknown config key {key!r} in override {ov!r}")
        try:
            d[parts[-1]] = json.loads(val)
        except json.JSONDecodeError:
            d[parts[-1]] = val
    return _build(RunConfig, data)
