"""Checkpoint/resume + fault-injection tests (SURVEY.md §5.3/§5.4).

A sweep killed mid-run and restarted from its checkpoint must produce
EXACTLY the counters of an uninterrupted run (batch t's key is
fold_in(seed, t), so resume is exact, not just exact-in-distribution).
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nbldpc_tpu import sim
from nbldpc_tpu.channel import inject_errors, perfect_llr
from nbldpc_tpu.code import save_alist
from nbldpc_tpu.codegen import make_peg_code
from nbldpc_tpu.decoders import qspa
from nbldpc_tpu.encode import Encoder
from nbldpc_tpu.graph import TannerGraph
from nbldpc_tpu.utils.config import (
    ChannelConfig, CodeConfig, DecoderConfig, RunConfig, SimConfig,
)


class _Kill(Exception):
    pass


def _cfg(tmp_path, ckpt=None):
    path = tmp_path / "tiny.alist"
    if not path.exists():
        save_alist(make_peg_code(16, 8, 4, dv=2, seed=5), path)
    return RunConfig(
        code=CodeConfig(path=str(path)),
        decoder=DecoderConfig(kind="qspa", max_iters=4),
        channel=ChannelConfig(ebn0_db=(2.0,)),
        sim=SimConfig(
            frames_per_step=16, max_frames=64, max_frame_errors=10**9, seed=9,
            checkpoint_path=str(ckpt) if ckpt else None, checkpoint_every=1,
        ),
    )


def test_kill_and_resume_exact(tmp_path):
    ref = sim.run_sweep(_cfg(tmp_path), mesh=None)

    ckpt = tmp_path / "sweep.ckpt"
    cfg = _cfg(tmp_path, ckpt=ckpt)

    def killer(t, counters):
        if t >= 2:
            raise _Kill()  # simulated crash after 2 of 4 macro-batches

    with pytest.raises(_Kill):
        sim.run_sweep(cfg, mesh=None, progress=killer)
    assert ckpt.exists()

    resumed = sim.run_sweep(cfg, mesh=None)  # restarts from the checkpoint
    assert resumed.steps < ref.steps  # really resumed, not recomputed
    for k, v in ref.counters.asdict().items():
        np.testing.assert_array_equal(
            np.asarray(resumed.counters.asdict()[k]), np.asarray(v), err_msg=k
        )


def test_checkpoint_config_hash_guard(tmp_path):
    ckpt = tmp_path / "sweep.ckpt"
    cfg = _cfg(tmp_path, ckpt=ckpt)
    sim.run_sweep(cfg, mesh=None)
    other = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, max_iters=5)
    )
    with pytest.raises(ValueError, match="different config"):
        sim.run_sweep(other, mesh=None)


def test_inject_errors_and_correct(small_codes):
    """Fault injection is the controlled error channel for decoder tests:
    two injected symbol errors at high confidence must be corrected."""
    spec = small_codes["gf4_n96"]
    g = TannerGraph(spec)
    enc = Encoder(spec)
    u = jax.random.randint(jax.random.PRNGKey(2), (4, enc.k), 0, spec.q, jnp.int32)
    cw = enc.encode(u)
    bad = inject_errors(cw, positions=[5, 40], values=[1, 3], q=spec.q)
    assert not np.array_equal(np.array(bad), np.array(cw))
    res = qspa.decode(g, perfect_llr(bad, spec.q, confidence=6.0), max_iters=12)
    assert np.all(np.array(res.done))
    np.testing.assert_array_equal(np.array(res.hard), np.array(cw))
