"""Native C++ host library vs its numpy fallbacks (bit-exact contracts).

The native library (native/nbldpc_host.cpp) replaces the reference genre's
C++ host core: GF tables, GF Gaussian elimination, PEG BFS. Each entry must
produce IDENTICAL results to the Python implementation. Skipped when the
toolchain is unavailable.
"""

import numpy as np
import pytest

from nbldpc_tpu import native
from nbldpc_tpu.gf import PRIM_POLY, get_field

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


@pytest.mark.parametrize("q", [4, 16, 64, 256])
def test_gf_tables_match(q):
    gf = get_field(q)
    exp, log, inv, mul = native.gf_tables(q, PRIM_POLY[q])
    np.testing.assert_array_equal(exp, gf.exp)
    np.testing.assert_array_equal(inv, gf.inv)
    np.testing.assert_array_equal(mul, gf.mul)
    np.testing.assert_array_equal(log[1:], gf.log[1:])


@pytest.mark.parametrize("q", [4, 16, 64])
def test_row_reduce_matches_python(q, monkeypatch):
    from nbldpc_tpu import encode

    gf = get_field(q)
    rng = np.random.default_rng(q)
    H = rng.integers(0, q, size=(12, 30)).astype(np.int32)

    Rn, rankn, pivn = native.gf_row_reduce(H, q, gf.mul, gf.inv)
    # force the pure-python path for the reference result
    monkeypatch.setattr(native, "available", lambda: False)
    Rp, rankp, pivp = encode.gf_row_reduce(H, gf)
    assert rankn == rankp
    np.testing.assert_array_equal(Rn, Rp)
    np.testing.assert_array_equal(pivn, pivp)


def test_peg_codegen_identical_with_and_without_native(monkeypatch):
    from nbldpc_tpu import codegen

    spec_native = codegen.make_peg_code(24, 12, 16, dv=2, seed=4)
    monkeypatch.setattr(native, "available", lambda: False)
    spec_py = codegen.make_peg_code(24, 12, 16, dv=2, seed=4)
    assert spec_native.q == spec_py.q
    for a, b in zip(spec_native.row_cols, spec_py.row_cols):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(spec_native.row_vals, spec_py.row_vals):
        np.testing.assert_array_equal(a, b)


def test_native_syndrome_matches(monkeypatch):
    from nbldpc_tpu.codegen import make_peg_code
    from nbldpc_tpu.encode import Encoder

    spec = make_peg_code(24, 12, 16, dv=2, seed=4)
    gf = get_field(spec.q)
    enc = Encoder(spec)
    rng = np.random.default_rng(0)
    u = rng.integers(0, spec.q, size=(1, enc.k)).astype(np.int32)
    import jax.numpy as jnp

    cw = np.array(enc.encode(jnp.asarray(u)))[0].astype(np.int32)

    lib = native.get_lib()
    row_ptr = np.cumsum([0] + [len(c) for c in spec.row_cols]).astype(np.int32)
    row_col = np.concatenate(spec.row_cols).astype(np.int32)
    row_val = np.concatenate(spec.row_vals).astype(np.int32)
    syn = np.zeros(spec.m, np.int32)
    lib.nb_syndrome(
        spec.q, spec.m, row_ptr, row_col, row_val,
        np.ascontiguousarray(gf.mul, np.int32).reshape(-1), cw, syn,
    )
    assert not syn.any(), "encoder output must satisfy H c = 0"
