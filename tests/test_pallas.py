"""Pallas kernel tests (SURVEY.md §4.5): interpret-mode differential checks
against the pure-XLA batch-last implementations, which are themselves
golden-tested against the numpy oracle. On-device equality runs under
NBLDPC_TPU_TESTS=1 (the `tpu` marker)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nbldpc_tpu.codegen import make_peg_code
from nbldpc_tpu.decoders import qspa
from nbldpc_tpu.graph import TannerGraph
from nbldpc_tpu.kernels.cn_qspa import cn_update_pallas


def _random_u(graph, B, seed=0):
    """x-domain CN inputs with correct pad structure (via the real gather)."""
    key = jax.random.PRNGKey(seed)
    Vv = jax.random.normal(
        key, (graph.n, graph.dv_max, graph.q, B), jnp.float32
    ) * 3.0
    return jax.jit(graph.gather_cn_x_bl)(Vv)


@pytest.mark.parametrize("q,n,m", [(4, 12, 6), (16, 16, 8), (64, 12, 6)])
def test_cn_kernel_interpret_matches_xla(q, n, m):
    spec = make_peg_code(n, m, q, dv=2, seed=3)
    g = TannerGraph(spec)
    U = _random_u(g, B=8)
    ref = jax.jit(lambda u: qspa.qspa_cn_update_bl(u, g))(U)
    out = cn_update_pallas(U, interpret=True)
    mask = np.array(g.cn_mask_np)[:, :, None, None]
    np.testing.assert_allclose(
        np.where(mask, np.array(out), 0.0),
        np.where(mask, np.array(ref), 0.0),
        rtol=1e-5,
        atol=1e-5,
    )


def _noisy(spec, frames, ebn0, seed):
    from nbldpc_tpu.channel import ebn0_to_sigma, transmit
    from nbldpc_tpu.encode import Encoder

    enc = Encoder(spec)
    u = jax.random.randint(
        jax.random.PRNGKey(seed), (frames, enc.k), 0, spec.q, dtype=jnp.int32
    )
    cw = enc.encode(u)
    sigma = float(ebn0_to_sigma(ebn0, spec.k / spec.n))
    return cw, transmit(jax.random.PRNGKey(seed + 1), cw, sigma, spec.q)


@pytest.mark.parametrize("q,n,m", [(4, 12, 6), (16, 16, 8)])
def test_resident_kernel_interpret_matches_xla(q, n, m):
    """K0 resident decoder (prob-domain BP) reproduces the log-domain XLA
    path exactly on these seeds: hard decisions, done flags, iters."""
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPA

    spec = make_peg_code(n, m, q, dv=2, seed=7)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 8, 2.5, seed=11)
    ref = qspa.decode(g, llr, max_iters=8, early_term=True, cn_impl="xla")
    dec = ResidentQSPA(g, max_iters=8, early_term=True)
    hard, done, iters = dec(llr, tb=8, interpret=True)
    np.testing.assert_array_equal(np.array(ref.hard), np.array(hard))
    np.testing.assert_array_equal(np.array(ref.done), np.array(done))
    np.testing.assert_array_equal(np.array(ref.iters), np.array(iters))


def test_resident_kernel_fixed_budget_interpret(small_codes):
    """Fixed-budget mode (fori, stats each iter) matches early-term answers."""
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPA

    spec = small_codes["gf16_tiny"]
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 8, 2.5, seed=3)
    d1 = ResidentQSPA(g, max_iters=6, early_term=True)
    d2 = ResidentQSPA(g, max_iters=6, early_term=False)
    h1, dn1, it1 = d1(llr, tb=8, interpret=True)
    h2, dn2, it2 = d2(llr, tb=8, interpret=True)
    np.testing.assert_array_equal(np.array(h1), np.array(h2))
    np.testing.assert_array_equal(np.array(dn1), np.array(dn2))
    np.testing.assert_array_equal(np.array(it1), np.array(it2))


@pytest.mark.parametrize("q,n,m", [(4, 12, 6), (16, 16, 8)])
def test_resident_kernel_bf16_interpret(q, n, m):
    """bf16 routing-matmul mode (opt-in via mm_precision="bf16"): one-hot
    routing stays exact, messages quantize — hard decisions/done must match
    the f32 resident kernel on these seeded easy-SNR frames."""
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPA

    spec = make_peg_code(n, m, q, dv=2, seed=7)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 8, 3.0, seed=23)
    d32 = ResidentQSPA(g, max_iters=8, early_term=True)
    d16 = ResidentQSPA(g, max_iters=8, early_term=True,
                       mm_dtype=jnp.bfloat16)
    h32, dn32, _ = d32(llr, tb=8, interpret=True)
    h16, dn16, _ = d16(llr, tb=8, interpret=True)
    np.testing.assert_array_equal(np.array(h32), np.array(h16))
    np.testing.assert_array_equal(np.array(dn32), np.array(dn16))


def test_resident_kernel_throughput_stats_mode(small_codes):
    """stats_each_iter=False (pure throughput mode) must keep the same final
    hard decisions and done flags as the default bookkeeping mode whenever
    frames do not wander after converging; iters reports max_iters."""
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPA

    spec = small_codes["gf16_tiny"]
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 8, 3.5, seed=9)
    d_full = ResidentQSPA(g, max_iters=6, early_term=False)
    d_thru = ResidentQSPA(g, max_iters=6, early_term=False,
                          stats_each_iter=False)
    h1, dn1, it1 = d_full(llr, tb=8, interpret=True)
    h2, dn2, it2 = d_thru(llr, tb=8, interpret=True)
    np.testing.assert_array_equal(np.array(h1), np.array(h2))
    np.testing.assert_array_equal(np.array(dn1), np.array(dn2))
    assert np.all(np.array(it2) == 6)  # fixed budget: no per-iter counting


@pytest.mark.tpu
def test_resident_kernel_device_statistical():
    """On-device K0 vs XLA path: done flags equal; >=99% hard agreement
    (prob- vs log-domain f32 drift can flip rare near-tie symbols)."""
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPA

    spec = make_peg_code(204, 102, 16, dv=2, seed=1)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 256, 2.0, seed=5)
    ref = qspa.decode(g, llr, max_iters=20, early_term=True, cn_impl="xla")
    dec = ResidentQSPA(g, max_iters=20, early_term=True)
    hard, done, iters = jax.jit(lambda x: dec(x, tb=64))(llr)
    assert np.mean(np.array(ref.hard) == np.array(hard)) > 0.99
    assert np.mean(np.array(ref.done) == np.array(done)) > 0.99


def test_resident_fl_rot_b4_interpret_exact(small_codes):
    """The radix-4 rotation variant (rot_impl="b4", flag-gated, measured
    slower on device and kept for the record) is fp-exact vs the default
    binary rolls: one-hot digit masks make every blend product exact."""
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPAFL

    spec = make_peg_code(16, 8, 16, dv=2, seed=3)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 24, 2.5, seed=9)
    h0, dn0, it0 = ResidentQSPAFL(g, 8, True)(llr, tb=24, interpret=True)
    h1, dn1, it1 = ResidentQSPAFL(g, 8, True, rot_impl="b4")(
        llr, tb=24, interpret=True)
    assert bool(jnp.all(h0 == h1))
    assert bool(jnp.all(dn0 == dn1))
    assert bool(jnp.all(it0 == it1))


def test_resident_kernels_gf32_interpret(small_codes):
    """GF(32) — the upper edge of the resident kernels' q <= 32 envelope
    and the only odd-p (2^5) case: frames-on-lanes QSPA matches the
    checks-on-lanes kernel and resident EMS matches the XLA path."""
    from nbldpc_tpu.decoders import ems
    from nbldpc_tpu.kernels.ems_resident import ResidentEMS
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPA, ResidentQSPAFL

    spec = make_peg_code(24, 12, 32, dv=2, seed=5)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 16, 3.0, seed=13)
    h0, dn0, it0 = ResidentQSPA(g, 6, True)(llr, tb=16, interpret=True)
    h1, dn1, it1 = ResidentQSPAFL(g, 6, True)(llr, tb=16, interpret=True)
    assert bool(jnp.all(h0 == h1)) and bool(jnp.all(dn0 == dn1))
    assert bool(jnp.all(it0 == it1))
    ref = ems.decode(g, llr, max_iters=6, nm=32, early_term=True,
                     use_pallas="no")
    h2, dn2, it2 = ResidentEMS(g, 6, nm=32, early_term=True)(
        llr, tb=16, interpret=True)
    assert bool(jnp.all(ref.hard == h2)) and bool(jnp.all(ref.done == dn2))
    assert bool(jnp.all(ref.iters == it2))


def test_resident_tile_dispatch():
    """Layout/tile selection: frames-on-lanes (tb 128) for 128-multiple
    batches, checks-on-lanes sublane tiles otherwise, none for tiny odd
    batches."""
    from nbldpc_tpu.decoders.qspa import _resident_tile

    assert _resident_tile(8192) == ("fl", 128)
    assert _resident_tile(128) == ("fl", 128)
    assert _resident_tile(96) == ("cl", 48)
    assert _resident_tile(24) == ("cl", 24)
    assert _resident_tile(7) == ("", 0)


@pytest.mark.parametrize("q,n,m", [(4, 12, 6), (16, 16, 8)])
def test_resident_ems_interpret_matches_xla(q, n, m):
    """K0-EMS resident decoder is frame-exact vs the XLA batch-last EMS
    path on dv=2 codes (same merge association, normalization points and
    tie-breaks; dv>2 differs only in posterior fp-sum order)."""
    from nbldpc_tpu.decoders import ems
    from nbldpc_tpu.kernels.ems_resident import ResidentEMS

    spec = make_peg_code(n, m, q, dv=2, seed=3)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 24, 3.0, seed=11)
    ref = ems.decode(g, llr, max_iters=8, nm=q, early_term=True,
                     use_pallas="no")
    dec = ResidentEMS(g, 8, nm=q, early_term=True)
    h1, dn1, it1 = dec(llr, tb=24, interpret=True)
    assert bool(jnp.all(ref.hard == h1))
    assert bool(jnp.all(ref.done == dn1))
    assert bool(jnp.all(ref.iters == it1))


def test_resident_ems_interpret_offset_and_throughput_mode(small_codes):
    """Offset correction flows through, and the fixed-budget throughput
    mode returns the same hard decisions as the bookkeeping mode."""
    from nbldpc_tpu.decoders import ems
    from nbldpc_tpu.kernels.ems_resident import ResidentEMS

    spec = make_peg_code(16, 8, 16, dv=2, seed=3)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 24, 3.0, seed=12)
    ref = ems.decode(g, llr, max_iters=6, nm=16, offset=0.3,
                     early_term=False, use_pallas="no")
    d1 = ResidentEMS(g, 6, nm=16, offset=0.3, early_term=False)
    d2 = ResidentEMS(g, 6, nm=16, offset=0.3, early_term=False,
                     stats_each_iter=False)
    h1, dn1, it1 = d1(llr, tb=24, interpret=True)
    h2, dn2, it2 = d2(llr, tb=24, interpret=True)
    assert bool(jnp.all(ref.hard == h1))
    assert bool(jnp.all(ref.done == dn1))
    assert bool(jnp.all(h1 == h2))


@pytest.mark.tpu
def test_resident_ems_device_exact_vs_xla():
    """On-device K0-EMS vs the XLA EMS path at the BASELINE GF(16) nm=16
    config. Interpret mode is bit-exact; on device the posterior GEMM's
    MXU f32 emulation (bf16 multi-pass) rounds the dv-edge sum slightly
    differently than XLA's elementwise adds (~2^-16 relative), which can
    shift a rare frame's convergence iteration — hard/done must still
    agree near-perfectly and iters within one on >=99% of frames."""
    from nbldpc_tpu.decoders import ems
    from nbldpc_tpu.kernels.ems_resident import ResidentEMS

    spec = make_peg_code(204, 102, 16, dv=2, seed=1)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 256, 2.5, seed=5)
    ref = ems.decode(g, llr, max_iters=10, nm=16, early_term=True,
                     use_pallas="no")
    dec = ResidentEMS(g, 10, nm=16, early_term=True)
    hard, done, iters = jax.jit(lambda x: dec(x, tb=128))(llr)
    assert np.mean(np.array(ref.hard) == np.array(hard)) > 0.999
    assert np.mean(np.array(ref.done) == np.array(done)) > 0.99
    di = np.abs(np.array(ref.iters) - np.array(iters))
    assert np.mean(di <= 1) > 0.99


@pytest.mark.tpu
def test_resident_fl_kernel_device_exact_vs_cl():
    """On-device frames-on-lanes K0 (the round-4 dispatch default for
    128-multiple batches) vs the checks-on-lanes kernel: the two layouts
    compute fp-identical arithmetic (same association order everywhere), so
    hard/done/iters must agree EXACTLY on the real chip as they do in
    interpret mode."""
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPA, ResidentQSPAFL

    spec = make_peg_code(204, 102, 16, dv=2, seed=1)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 256, 2.0, seed=5)
    d_cl = ResidentQSPA(g, max_iters=20, early_term=True)
    d_fl = ResidentQSPAFL(g, max_iters=20, early_term=True)
    h0, dn0, it0 = jax.jit(lambda x: d_cl(x, tb=64))(llr)
    h1, dn1, it1 = jax.jit(lambda x: d_fl(x, tb=128))(llr)
    assert bool(jnp.all(dn0 == dn1))
    assert bool(jnp.all(it0 == it1))
    # device reductions may associate differently than the unrolled scans;
    # require near-perfect agreement, exact on converged frames
    both = np.array(dn0) & np.array(dn1)
    assert np.mean(np.array(h0)[both] == np.array(h1)[both]) > 0.9999
    assert np.mean(np.array(h0) == np.array(h1)) > 0.999


@pytest.mark.tpu
def test_resident_throughput_modes_device():
    """The fixed-budget throughput variants (early_term=False,
    stats_each_iter=False — the bench.py / run_all programs, compiled
    DIFFERENTLY from the bookkeeping mode) agree with the bookkeeping
    kernels on hard decisions for frames both modes decode."""
    from nbldpc_tpu.kernels.ems_resident import ResidentEMS
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPAFL

    spec = make_peg_code(204, 102, 16, dv=2, seed=1)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 256, 2.5, seed=5)
    d_full = ResidentQSPAFL(g, max_iters=12, early_term=False)
    d_thru = ResidentQSPAFL(g, max_iters=12, early_term=False,
                            stats_each_iter=False)
    h0, dn0, _ = jax.jit(lambda x: d_full(x, tb=128))(llr)
    h1, dn1, _ = jax.jit(lambda x: d_thru(x, tb=128))(llr)
    assert bool(jnp.all(dn0 == dn1))
    # throughput mode reports the FINAL iteration's decisions; they match
    # the frozen-at-convergence decisions on converged frames
    both = np.array(dn0)
    assert np.mean(np.array(h0)[both] == np.array(h1)[both]) > 0.999
    e_full = ResidentEMS(g, 12, nm=16, early_term=False)
    e_thru = ResidentEMS(g, 12, nm=16, early_term=False,
                         stats_each_iter=False)
    h2, dn2, _ = jax.jit(lambda x: e_full(x, tb=128))(llr)
    h3, dn3, _ = jax.jit(lambda x: e_thru(x, tb=128))(llr)
    assert bool(jnp.all(dn2 == dn3))
    both = np.array(dn2)
    assert np.mean(np.array(h2)[both] == np.array(h3)[both]) > 0.999


@pytest.mark.tpu
def test_resident_fl_kernel_gf4_device():
    """GF(4) on-device: the config the old layout served worst (M=48 ->
    128-lane pad = 2.7x waste). Statistical agreement with the XLA path."""
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPAFL

    spec = make_peg_code(96, 48, 4, dv=2, seed=1)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 256, 2.5, seed=7)
    ref = qspa.decode(g, llr, max_iters=20, early_term=True, cn_impl="xla")
    dec = ResidentQSPAFL(g, max_iters=20, early_term=True)
    hard, done, iters = jax.jit(lambda x: dec(x, tb=128))(llr)
    assert np.mean(np.array(ref.hard) == np.array(hard)) > 0.99
    assert np.mean(np.array(ref.done) == np.array(done)) > 0.99


@pytest.mark.tpu
def test_cn_kernel_device_matches_xla():
    spec = make_peg_code(204, 102, 16, dv=2, seed=1)
    g = TannerGraph(spec)
    U = _random_u(g, B=256)
    ref = jax.jit(lambda u: qspa.qspa_cn_update_bl(u, g))(U)
    out = cn_update_pallas(U)
    mask = np.array(g.cn_mask_np)[:, :, None, None]
    np.testing.assert_allclose(
        np.where(mask, np.array(out), 0.0),
        np.where(mask, np.array(ref), 0.0),
        rtol=1e-4,
        atol=1e-4,
    )


@pytest.mark.tpu
def test_cn_kernel_mxu_wht_gf256_device():
    """K1's flag-gated MXU-WHT variant (measured accurate-but-not-faster
    at Precision.HIGHEST; default-precision emulation leaves bf16-grade
    spectra errors — see cn_qspa.py) stays numerically sound on the real
    chip vs the XLA path."""
    spec = make_peg_code(255, 80, 256, dv=2, seed=1)
    g = TannerGraph(spec)
    U = _random_u(g, B=128)
    ref = jax.jit(lambda u: qspa.qspa_cn_update_bl(u, g))(U)
    out = cn_update_pallas(U, wht_impl="mxu")
    mask = np.array(g.cn_mask_np)[:, :, None, None]
    np.testing.assert_allclose(
        np.where(mask, np.array(out), 0.0),
        np.where(mask, np.array(ref), 0.0),
        rtol=1e-3,
        atol=1e-3,
    )


# ---------------------------------------------------------------------------
# On-device gate (round-3 rule): every Pallas kernel x dtype mode reachable
# from bench.py / sim.py must compile AND agree on the real chip — interpret
# mode does not exercise Mosaic lowering (the round-1/2 bf16 lesson).
# ---------------------------------------------------------------------------


@pytest.mark.tpu
def test_resident_kernel_bf16_device():
    """bf16 resident mode (the bench.py headline config) on the real chip:
    must Mosaic-compile and lose no coding performance vs f32.

    Raw all-frame symbol agreement is the WRONG invariant at waterfall SNR
    (measured 93.5% on this seed): frames that never converge wander
    chaotically, and bf16-quantized BP legitimately wanders differently.
    The meaningful invariants are (a) frames converged under both
    precisions decode identically, (b) convergence rates match closely,
    (c) bf16 corrects (essentially) as many frames as f32 on the same
    noise realizations — the claim the mode is shipped under."""
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPA

    spec = make_peg_code(204, 102, 16, dv=2, seed=1)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 256, 2.0, seed=5)
    d32 = ResidentQSPA(g, max_iters=20, early_term=False,
                       stats_each_iter=False)
    d16 = ResidentQSPA(g, max_iters=20, early_term=False,
                       stats_each_iter=False, mm_dtype=jnp.bfloat16)
    h32, dn32, _ = jax.jit(lambda x: d32(x, tb=64))(llr)
    h16, dn16, _ = jax.jit(lambda x: d16(x, tb=64))(llr)
    h32, dn32 = np.array(h32), np.array(dn32)
    h16, dn16 = np.array(h16), np.array(dn16)
    both = dn32 & dn16
    assert both.sum() > 128  # the comparison must not be vacuous
    # (a) converged frames agree symbol-for-symbol (near-ties excepted)
    assert np.mean(h32[both] == h16[both]) > 0.999
    # (b) convergence rates match within the binomial noise of the measured
    # rate (~3 sigma on 256 frames), not a seed-pinned absolute count: a
    # benign numerics change (compiler update, tile shape) may shift a few
    # marginal frames without any real coding-performance regression
    nfr = dn32.shape[0]
    p32 = dn32.sum() / nfr
    sigma = float(np.sqrt(max(p32 * (1 - p32), 0.02) * nfr))
    assert abs(int(dn32.sum()) - int(dn16.sum())) <= max(8, int(3 * sigma))
    # (c) frame-error counts vs the true codewords are equivalent
    fe32 = int(np.sum(np.any(h32 != np.array(cw), axis=1)))
    fe16 = int(np.sum(np.any(h16 != np.array(cw), axis=1)))
    assert fe16 <= fe32 + max(6, int(0.15 * fe32))


@pytest.mark.tpu
@pytest.mark.parametrize("q,nm", [(16, 16), (64, 8), (256, 16)])
def test_k2_kernel_device_matches_xla(q, nm):
    """K2 fused EMS CN kernel on the real chip vs the XLA batch-last path
    (exact same truncated-list semantics; f32 tolerance)."""
    from nbldpc_tpu.decoders.ems import ems_cn_update_bl
    from nbldpc_tpu.kernels.cn_ems import ems_cn_update_bl_pallas

    spec = make_peg_code(24, 12, q, dv=2, seed=3)
    g = TannerGraph(spec)
    U = _random_u(g, B=128, seed=q)
    ref = jax.jit(lambda u: ems_cn_update_bl(u, g, nm=nm))(U)
    out = ems_cn_update_bl_pallas(U, nm=nm)
    mask = np.array(g.cn_mask_np)[:, :, None, None]
    np.testing.assert_allclose(
        np.where(mask, np.array(out), 0.0),
        np.where(mask, np.array(ref), 0.0),
        rtol=1e-4,
        atol=1e-4,
    )


@pytest.mark.tpu
@pytest.mark.parametrize("q", [16, 64])
def test_k5_tems_kernel_device_matches_xla(q):
    """K5 fused T-EMS CN kernel on the real chip vs the XLA batch-last path."""
    from nbldpc_tpu.decoders.tems import tems_cn_update_bl
    from nbldpc_tpu.kernels.cn_tems import tems_cn_update_bl_pallas

    spec = make_peg_code(24, 12, q, dv=2, seed=3)
    g = TannerGraph(spec)
    U = _random_u(g, B=128, seed=q + 1)
    ref = jax.jit(lambda u: tems_cn_update_bl(u, g))(U)
    out = tems_cn_update_bl_pallas(U)
    mask = np.array(g.cn_mask_np)[:, :, None, None]
    np.testing.assert_allclose(
        np.where(mask, np.array(out), 0.0),
        np.where(mask, np.array(ref), 0.0),
        rtol=1e-4,
        atol=1e-4,
    )


@pytest.mark.tpu
def test_resident_throughput_mode_waterfall_device():
    """stats_each_iter=False (the headline bench mode) at waterfall SNR on
    device. Message evolution is bookkeeping-independent, so these exact
    invariants hold even when frames wander after converging:
      - done(off-mode) => done(stats mode)  (final syndrome pass was seen);
      - hard decisions equal on frames the stats mode never froze;
      - frames the stats mode froze carry a syndrome-passing decision."""
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPA

    spec = make_peg_code(204, 102, 16, dv=2, seed=1)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 256, 1.2, seed=17)           # mid-waterfall
    d_on = ResidentQSPA(g, max_iters=20, early_term=False,
                        stats_each_iter=True)
    d_off = ResidentQSPA(g, max_iters=20, early_term=False,
                         stats_each_iter=False)
    h_on, dn_on, _ = jax.jit(lambda x: d_on(x, tb=64))(llr)
    h_off, dn_off, _ = jax.jit(lambda x: d_off(x, tb=64))(llr)
    h_on, dn_on = np.array(h_on), np.array(dn_on)
    h_off, dn_off = np.array(h_off), np.array(dn_off)
    assert not np.any(dn_off & ~dn_on)
    np.testing.assert_array_equal(h_off[~dn_on], h_on[~dn_on])
    syn = np.array(jax.jit(g.syndrome)(jnp.asarray(h_on)))
    assert not np.any(syn[dn_on])


def test_resident_kernels_irregular_pads_interpret(small_codes):
    """Irregular (pad-bearing) q<=32 code through BOTH resident QSPA
    layouts and resident EMS: the pad fixup paths (`has_pads`/`has_pads2`/
    `force_padfix`) must execute and stay exact vs the XLA paths
    (round-4 verdict Weak #6: every prior resident test was dc-regular)."""
    from nbldpc_tpu.decoders import ems
    from nbldpc_tpu.kernels.ems_resident import ResidentEMS
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPA, ResidentQSPAFL

    spec = small_codes["gf16_irr"]
    g = TannerGraph(spec)
    assert g.has_cn_pads, "fixture must be dc-irregular"
    cw, llr = _noisy(spec, 16, 2.5, seed=13)

    ref = qspa.decode(g, llr, max_iters=8, early_term=True, cn_impl="xla")
    d_cl = ResidentQSPA(g, max_iters=8, early_term=True)
    d_fl = ResidentQSPAFL(g, max_iters=8, early_term=True)
    assert d_cl.has_pads and d_fl.has_pads2, "pad fixup paths must be live"
    for dec, tb in ((d_cl, 8), (d_fl, 16)):
        hard, done, iters = dec(llr, tb=tb, interpret=True)
        np.testing.assert_array_equal(np.array(ref.hard), np.array(hard))
        np.testing.assert_array_equal(np.array(ref.done), np.array(done))
        np.testing.assert_array_equal(np.array(ref.iters), np.array(iters))

    ref_e = ems.decode(g, llr, max_iters=8, nm=spec.q, early_term=True,
                       use_pallas="no")
    d_e = ResidentEMS(g, 8, nm=spec.q, early_term=True)
    assert d_e.force_padfix, "EMS pad fixup path must be live"
    h1, dn1, it1 = d_e(llr, tb=16, interpret=True)
    np.testing.assert_array_equal(np.array(ref_e.hard), np.array(h1))
    np.testing.assert_array_equal(np.array(ref_e.done), np.array(dn1))
    np.testing.assert_array_equal(np.array(ref_e.iters), np.array(it1))


@pytest.mark.tpu
def test_resident_kernels_irregular_pads_device(small_codes):
    """The pad fixup paths must also survive Mosaic lowering on the real
    chip (interpret mode does not test lowering — round-2 lesson)."""
    from nbldpc_tpu.decoders import ems
    from nbldpc_tpu.kernels.ems_resident import ResidentEMS
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPA, ResidentQSPAFL

    spec = small_codes["gf16_irr"]
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 256, 2.5, seed=13)
    ref = qspa.decode(g, llr, max_iters=8, early_term=True, cn_impl="xla")
    for dec, tb in ((ResidentQSPA(g, 8, True), 64),
                    (ResidentQSPAFL(g, 8, True), 128)):
        hard, done, iters = jax.jit(lambda x, d=dec, t=tb: d(x, tb=t))(llr)
        assert np.mean(np.array(ref.hard) == np.array(hard)) > 0.999
        assert np.mean(np.array(ref.done) == np.array(done)) > 0.99
    ref_e = ems.decode(g, llr, max_iters=8, nm=spec.q, early_term=True,
                       use_pallas="no")
    d_e = ResidentEMS(g, 8, nm=spec.q, early_term=True)
    h1, dn1, _ = jax.jit(lambda x: d_e(x, tb=128))(llr)
    # MXU f32-emulation rounding in the routing GEMMs can flip a couple
    # of divergent frames' symbols on this 18-symbol code (measured
    # 99.78%); interpret mode is exact (test above)
    assert np.mean(np.array(ref_e.hard) == np.array(h1)) > 0.99
    assert np.mean(np.array(ref_e.done) == np.array(dn1)) > 0.99


def test_resident_kernels_dv3_gf4_interpret(small_codes):
    """dv=3 GF(4) code (round-4 verdict Weak #7: the framework must not be
    quietly tuned to dv=2) through both resident QSPA layouts. For dv>2 the
    posterior GEMM can associate the 3-term extrinsic sum differently than
    XLA's slot-ordered add, so agreement is near-exact, not bitwise."""
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPA, ResidentQSPAFL

    spec = small_codes["gf4_dv3"]
    g = TannerGraph(spec)
    assert int(spec.dv.max()) == 3
    cw, llr = _noisy(spec, 64, 2.5, seed=17)
    ref = qspa.decode(g, llr, max_iters=8, early_term=True, cn_impl="xla")
    for dec, tb in ((ResidentQSPA(g, 8, True), 8),
                    (ResidentQSPAFL(g, 8, True), 16)):
        hard, done, iters = dec(llr, tb=tb, interpret=True)
        assert np.mean(np.array(ref.hard) == np.array(hard)) > 0.99
        assert np.mean(np.array(ref.done) == np.array(done)) > 0.95


def test_qc_slot_uniform_static_rotation_interpret():
    """QC code with per-slot-uniform weights: both resident kernels must
    take their STATIC rotation/permutation paths and stay exact vs the
    blend paths and the XLA reference (round-5 VERDICT item 6)."""
    from nbldpc_tpu.codegen import make_qc_code
    from nbldpc_tpu.decoders import ems
    from nbldpc_tpu.kernels.ems_resident import ResidentEMS
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPAFL

    spec = make_qc_code(48, 24, 16, z=8, dv=2, seed=3, weight_mode="slot")
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 16, 2.5, seed=19)

    d_st = ResidentQSPAFL(g, max_iters=8, early_term=True)
    assert d_st.rot_static is not None, "slot-uniform code must go static"
    d_bl = ResidentQSPAFL(g, max_iters=8, early_term=True)
    d_bl.rot_static = None                      # force the blend path
    ref = qspa.decode(g, llr, max_iters=8, early_term=True, cn_impl="xla")
    h0, dn0, it0 = d_st(llr, tb=16, interpret=True)
    h1, dn1, it1 = d_bl(llr, tb=16, interpret=True)
    np.testing.assert_array_equal(np.array(h0), np.array(h1))
    np.testing.assert_array_equal(np.array(dn0), np.array(dn1))
    np.testing.assert_array_equal(np.array(it0), np.array(it1))
    np.testing.assert_array_equal(np.array(ref.hard), np.array(h0))
    np.testing.assert_array_equal(np.array(ref.done), np.array(dn0))

    e_st = ResidentEMS(g, 8, nm=16, early_term=True)
    assert e_st.perm_static is not None
    e_bl = ResidentEMS(g, 8, nm=16, early_term=True)
    e_bl.perm_static = None
    ref_e = ems.decode(g, llr, max_iters=8, nm=16, early_term=True,
                       use_pallas="no")
    h2, dn2, _ = e_st(llr, tb=16, interpret=True)
    h3, dn3, _ = e_bl(llr, tb=16, interpret=True)
    np.testing.assert_array_equal(np.array(h2), np.array(h3))
    np.testing.assert_array_equal(np.array(dn2), np.array(dn3))
    np.testing.assert_array_equal(np.array(ref_e.hard), np.array(h2))


def test_qc_code_properties():
    """QC constructor: full rank (encoder exists), H*encode(u) == 0, and
    per-slot weights actually uniform in slot mode."""
    from nbldpc_tpu.codegen import make_qc_code
    from nbldpc_tpu.encode import Encoder

    spec = make_qc_code(48, 24, 16, z=8, dv=2, seed=2, weight_mode="slot")
    enc = Encoder(spec)
    g = TannerGraph(spec)
    u = jax.random.randint(jax.random.PRNGKey(3), (4, enc.k), 0, 16,
                           dtype=jnp.int32)
    cw = enc.encode(u)
    syn = np.array(g.syndrome(cw))
    assert (syn == 0).all()
    for j in range(g.dc_max):
        w = g.cn_w_np[g.cn_mask_np[:, j], j]
        assert (w == w[0]).all(), f"slot {j} weights not uniform"


def test_resident_ems_truncated_interpret(small_codes):
    """nm < q resident EMS (round-5 VERDICT item 7): classic truncated-list
    semantics whole-decode resident. Exact vs the XLA classic path on
    these seeds (nm=q/2); rare fp ties can flip a late-iteration argmax at
    smaller nm, so nm=q/4 asserts near-exactness."""
    from nbldpc_tpu.decoders import ems
    from nbldpc_tpu.kernels.ems_resident import ResidentEMS

    for name, nm_exact, nm_loose in (("gf4_tiny", 2, 2), ("gf16_tiny", 8, 4)):
        spec = small_codes[name]
        g = TannerGraph(spec)
        cw, llr = _noisy(spec, 24, 3.0, seed=21)
        ref = ems.decode(g, llr, max_iters=8, nm=nm_exact, early_term=True,
                         use_pallas="no")
        h, dn, it = ResidentEMS(g, 8, nm=nm_exact, early_term=True)(
            llr, tb=24, interpret=True)
        np.testing.assert_array_equal(np.array(ref.hard), np.array(h), name)
        np.testing.assert_array_equal(np.array(ref.done), np.array(dn))
        np.testing.assert_array_equal(np.array(ref.iters), np.array(it))
        ref = ems.decode(g, llr, max_iters=8, nm=nm_loose, early_term=True,
                         use_pallas="no")
        h, dn, it = ResidentEMS(g, 8, nm=nm_loose, early_term=True)(
            llr, tb=24, interpret=True)
        assert np.mean(np.array(ref.hard) == np.array(h)) > 0.99
        np.testing.assert_array_equal(np.array(ref.done), np.array(dn))


@pytest.mark.tpu
def test_resident_highq_device_vs_xla():
    """The round-5 large-q resident kernel (now the q>32 QSPA dispatch
    default) must survive Mosaic lowering on the real chip: GF(64) and
    GF(256) small codes, device resident vs XLA, near-exact (prob- vs
    log-domain fp ties only)."""
    for q, n, m in ((64, 24, 8), (256, 20, 6)):
        spec = make_peg_code(n, m, q, dv=2, seed=3)
        g = TannerGraph(spec)
        cw, llr = _noisy(spec, 64, 3.0, seed=23)
        ref = qspa.decode(g, llr, max_iters=6, early_term=True,
                          cn_impl="xla")
        res = qspa.decode(g, llr, max_iters=6, early_term=True,
                          cn_impl="resident")
        # prob-domain GEMM routing on the MXU's multi-pass f32 emulation
        # rounds ~2^-16 relative vs XLA's elementwise adds; across a
        # 256-way argmax that flips ~0.5% of symbols on noisy frames
        # (measured 99.53% at GF(256)); statistical FER equivalence is
        # pinned by fer_curves_r5 (resident 0.0020 vs r4 XLA-path 0.0023)
        assert np.mean(np.array(ref.hard) == np.array(res.hard)) > 0.99, q
        assert np.mean(np.array(ref.done) == np.array(res.done)) > 0.95, q


@pytest.mark.tpu
def test_chunk8_static_rotation_device():
    """chunk8 codes (the bench.py flagship default since round 5) take the
    STATIC rotation path — its Mosaic lowering must agree with the XLA
    path on device for both resident kernels."""
    from nbldpc_tpu.codegen import build_standard_code
    from nbldpc_tpu.decoders import ems
    from nbldpc_tpu.kernels.ems_resident import ResidentEMS
    from nbldpc_tpu.kernels.qspa_resident import ResidentQSPAFL

    spec = build_standard_code("gf16_n204_k102_c8")
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 256, 2.5, seed=29)
    d = ResidentQSPAFL(g, max_iters=8, early_term=True)
    assert d.rot_static is not None
    ref = qspa.decode(g, llr, max_iters=8, early_term=True, cn_impl="xla")
    h, dn, _ = jax.jit(lambda x: d(x, tb=128))(llr)
    assert np.mean(np.array(ref.hard) == np.array(h)) > 0.999
    assert np.mean(np.array(ref.done) == np.array(dn)) > 0.98
    e = ResidentEMS(g, 8, nm=16, early_term=True)
    assert e.perm_static is not None
    ref_e = ems.decode(g, llr, max_iters=8, nm=16, early_term=True,
                       use_pallas="no")
    h2, dn2, _ = jax.jit(lambda x: e(x, tb=128))(llr)
    assert np.mean(np.array(ref_e.hard) == np.array(h2)) > 0.999
    assert np.mean(np.array(ref_e.done) == np.array(dn2)) > 0.98


@pytest.mark.tpu
def test_bubble_kernel_device_vs_xla():
    """Fused bubble CN kernel on device vs the XLA bubble path (GF(256))."""
    from nbldpc_tpu.decoders import ems

    spec = make_peg_code(20, 6, 256, dv=2, seed=3)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 128, 4.0, seed=31)
    ref = ems.decode(g, llr, max_iters=4, nm=16, merge="bubble",
                     use_pallas="no")
    res = ems.decode(g, llr, max_iters=4, nm=16, merge="bubble",
                     use_pallas="yes")
    assert np.mean(np.array(ref.hard) == np.array(res.hard)) > 0.999
    assert np.mean(np.array(ref.done) == np.array(res.done)) > 0.98


@pytest.mark.tpu
def test_tems_truncated_device_vs_xla():
    """One-sided truncated T-EMS through the K5 kernel on device vs XLA."""
    from nbldpc_tpu.decoders import tems

    spec = make_peg_code(72, 12, 64, dv=2, seed=2)
    g = TannerGraph(spec)
    cw, llr = _noisy(spec, 64, 4.0, seed=37)
    ref = tems.decode(g, llr, max_iters=6, offset=2.0, n_r=8,
                      use_pallas="no")
    res = tems.decode(g, llr, max_iters=6, offset=2.0, n_r=8,
                      use_pallas="yes")
    assert np.mean(np.array(ref.hard) == np.array(res.hard)) > 0.999
    assert np.mean(np.array(ref.done) == np.array(res.done)) > 0.98
