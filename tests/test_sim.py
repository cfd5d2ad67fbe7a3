"""Sim engine: counters, stop criteria, determinism, checkpoint/resume."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nbldpc_tpu import sim
from nbldpc_tpu.graph import TannerGraph
from nbldpc_tpu.utils.config import (
    ChannelConfig, CodeConfig, DecoderConfig, RunConfig, SimConfig,
)


def _tiny_cfg(tmp_code_path=None, **sim_kw):
    return RunConfig(
        code=CodeConfig(name=None, path=None) if tmp_code_path else CodeConfig(name=None),
        decoder=DecoderConfig(kind="qspa", max_iters=4),
        channel=ChannelConfig(ebn0_db=(1.0, 3.0)),
        sim=SimConfig(frames_per_step=16, max_frames=32, max_frame_errors=1000, **sim_kw),
    )


@pytest.fixture(scope="module")
def tiny_run_cfg(tmp_path_factory, request):
    from nbldpc_tpu.code import save_alist
    from nbldpc_tpu.codegen import make_peg_code

    path = tmp_path_factory.mktemp("codes") / "tiny.alist"
    save_alist(make_peg_code(16, 8, 4, dv=2, seed=5), path)
    cfg = RunConfig(
        code=CodeConfig(path=str(path)),
        decoder=DecoderConfig(kind="qspa", max_iters=4),
        channel=ChannelConfig(ebn0_db=(1.0, 3.0)),
        sim=SimConfig(frames_per_step=16, max_frames=32, max_frame_errors=10**9, seed=9),
    )
    return cfg


def test_run_sweep_counts(tiny_run_cfg):
    res = sim.run_sweep(tiny_run_cfg)
    assert np.all(res.counters.frames == 32)
    # more noise -> more errors (statistically certain at these SNRs/sizes)
    assert res.counters.symbol_errors[0] >= res.counters.symbol_errors[1]
    assert res.steps == 2
    assert np.all(res.counters.converged <= res.counters.frames)
    assert res.ber.shape == (2,)


def test_run_sweep_deterministic(tiny_run_cfg):
    r1 = sim.run_sweep(tiny_run_cfg)
    r2 = sim.run_sweep(tiny_run_cfg)
    for f in ("frames", "bit_errors", "symbol_errors", "frame_errors"):
        np.testing.assert_array_equal(
            getattr(r1.counters, f), getattr(r2.counters, f)
        )


def test_frame_error_stop(tiny_run_cfg):
    cfg = dataclasses.replace(
        tiny_run_cfg,
        sim=dataclasses.replace(tiny_run_cfg.sim, max_frames=10**9, max_frame_errors=1),
        channel=ChannelConfig(ebn0_db=(-2.0,)),  # heavy noise -> errors fast
    )
    res = sim.run_sweep(cfg)
    assert res.counters.frame_errors[0] >= 1
    assert res.steps <= 3


def test_finished_snr_slots_reallocated(tiny_run_cfg):
    """When an SNR point hits its stop rule, its batch slots serve the
    still-active points (SURVEY C13): total decoded frames stay steps*S*B,
    the finished point stops accumulating, and the run stays
    deterministic."""
    cfg = dataclasses.replace(
        tiny_run_cfg,
        # heavy noise at point 0 -> it hits max_frame_errors within a step
        # or two; point 1 needs max_frames
        sim=dataclasses.replace(
            tiny_run_cfg.sim, max_frames=96, max_frame_errors=2,
            frames_per_step=16),
        channel=ChannelConfig(ebn0_db=(-3.0, 6.0)),
    )
    res = sim.run_sweep(cfg)
    S, B = 2, 16
    assert int(res.counters.frames.sum()) == res.steps * S * B
    # the noisy point stopped early; its released slots accelerated the
    # clean point past what its own slot alone would have served
    assert res.counters.frames[0] < res.counters.frames[1]
    assert res.counters.frames[1] >= 96
    r2 = sim.run_sweep(cfg)
    np.testing.assert_array_equal(res.counters.frames, r2.counters.frames)
    np.testing.assert_array_equal(
        res.counters.symbol_errors, r2.counters.symbol_errors)


def test_random_codeword_mode(tiny_run_cfg):
    cfg = dataclasses.replace(
        tiny_run_cfg,
        channel=ChannelConfig(ebn0_db=(2.0,), zero_codeword=False),
    )
    res = sim.run_sweep(cfg)
    assert np.all(res.counters.frames == 32)


def test_checkpoint_resume(tiny_run_cfg, tmp_path):
    """Interrupted sweep resumed from snapshot == uninterrupted sweep
    (SURVEY.md §5.3/§5.4: exact resume, not just in-distribution)."""
    ck = tmp_path / "sweep.ckpt"
    cfg_full = dataclasses.replace(
        tiny_run_cfg,
        sim=dataclasses.replace(tiny_run_cfg.sim, max_frames=64),
    )
    full = sim.run_sweep(cfg_full)

    # interrupted: run half (max_frames=32), with checkpointing on
    cfg_half = dataclasses.replace(
        cfg_full,
        sim=dataclasses.replace(
            cfg_full.sim, max_frames=32, checkpoint_path=str(ck), checkpoint_every=1
        ),
    )
    sim.run_sweep(cfg_half)
    assert ck.exists()

    # resume to completion — config hash must match the full run's sim params
    cfg_resume = dataclasses.replace(
        cfg_full,
        sim=dataclasses.replace(
            cfg_full.sim, max_frames=64, checkpoint_path=str(ck), checkpoint_every=1
        ),
    )
    # hashes differ (max_frames in hash) -> rewrite stamp to simulate restart
    import json

    payload = json.loads(ck.read_text())
    payload["config_hash"] = cfg_resume.config_hash()
    ck.write_text(json.dumps(payload))

    resumed = sim.run_sweep(cfg_resume)
    for f in ("frames", "bit_errors", "symbol_errors", "frame_errors"):
        np.testing.assert_array_equal(
            getattr(full.counters, f), getattr(resumed.counters, f), err_msg=f
        )


def test_checkpoint_hash_mismatch(tiny_run_cfg, tmp_path):
    ck = tmp_path / "sweep.ckpt"
    cfg = dataclasses.replace(
        tiny_run_cfg,
        sim=dataclasses.replace(
            tiny_run_cfg.sim, checkpoint_path=str(ck), checkpoint_every=1
        ),
    )
    sim.run_sweep(cfg)
    cfg2 = dataclasses.replace(
        cfg, decoder=DecoderConfig(kind="qspa", max_iters=7),
        sim=dataclasses.replace(cfg.sim, checkpoint_path=str(ck)),
    )
    with pytest.raises(ValueError, match="different config"):
        sim.run_sweep(cfg2)


def test_dv3_gf4_fer_point():
    """dv=3 GF(4) code end-to-end FER sanity (round-4 verdict Weak #7):
    the waterfall must behave (higher SNR -> lower FER) on a code family
    the framework was NOT tuned on. Deterministic given the seed."""
    import numpy as np

    from nbldpc_tpu import sim
    from nbldpc_tpu.code import save_alist
    from nbldpc_tpu.codegen import make_peg_code
    from nbldpc_tpu.utils.config import (
        ChannelConfig, CodeConfig, DecoderConfig, RunConfig, SimConfig,
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "gf4_dv3.alist")
        save_alist(make_peg_code(24, 12, 4, dv=3, seed=5), path)
        cfg = RunConfig(
            code=CodeConfig(path=path),
            decoder=DecoderConfig(kind="qspa", max_iters=8),
            channel=ChannelConfig(ebn0_db=(1.0, 4.0)),
            sim=SimConfig(frames_per_step=64, max_frames=256,
                          max_frame_errors=10**9, seed=9),
        )
        res = sim.run_sweep(cfg)
    fer = np.asarray(res.fer)
    assert fer[1] < fer[0], f"FER must fall with SNR: {fer}"
    assert fer[0] > 0, "low-SNR point should see some frame errors"
