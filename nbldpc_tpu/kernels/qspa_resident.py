"""Pallas K0: VMEM-resident full QSPA decoder — the flagship TPU kernel.

One kernel invocation decodes TB frames for ALL max_iters iterations with the
message tensors resident in VMEM: HBM traffic is one LLR read and one
hard-decision write per frame, total — the true speed-of-light design point
(BASELINE.json "speed-of-light HBM bandwidth"). This is what replaces the
reference genre's C++ decoder inner loops (SURVEY.md §2.2) at the whole-
decoder granularity rather than per-phase.

Key TPU-native decisions:
- Layout [q, dc, TB, M]: GF symbols on the leading axis (WHT = static
  slice/concat butterflies), frames on sublanes, checks on lanes.
- Tanner-graph routing = one-hot f32 matmuls on the MXU (exact for
  permutation matrices); no gathers anywhere.
- Per-edge GF-weight permutations = q x q masked accumulates against
  precomputed 0/1 masks (static, unrolled; q <= 32 guards apply).
- Probability-domain BP with per-iteration renormalization: zero
  transcendentals inside the loop (one softmax before it). Mathematically
  identical to the log-domain path (BP is scale-invariant); f32 rounding
  differs at ~1e-6.
- Syndrome via GF bit-decomposition (int ops), per-frame done/iters
  bookkeeping inside the kernel; optional whole-block early exit.

Requires q * dc * TB * M * 4B * ~6 live arrays to fit VMEM — the standard
NB-LDPC code sizes (SURVEY.md §6) fit comfortably at TB=64..128.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbldpc_tpu.graph import TannerGraph

PROB_FLOOR = 1e-12


def _wht_lead(x: jnp.ndarray, q: int) -> jnp.ndarray:
    """Unnormalized WHT along leading axis 0 via static slices + concat."""
    p = q.bit_length() - 1
    sign_shape = (q,) + (1,) * (x.ndim - 1)
    a_idx = jax.lax.broadcasted_iota(jnp.int32, sign_shape, 0)
    for i in range(p):
        h = 1 << i
        pieces = []
        for b in range(0, q, 2 * h):
            pieces.append(x[b + h : b + 2 * h])
            pieces.append(x[b : b + h])
        partner = jnp.concatenate(pieces, axis=0)
        hi = (a_idx & h) != 0
        x = jnp.where(hi, partner - x, partner + x)
    return x


class ResidentQSPA:
    """Builds the resident-decode kernel for one (graph, max_iters) config."""

    def __init__(self, graph: TannerGraph, max_iters: int, early_term: bool = True,
                 stats_each_iter: bool = True, mm_dtype=jnp.float32):
        if graph.q > 32:
            raise ValueError("resident kernel supports q <= 32 (use XLA path)")
        self.graph = graph
        self.max_iters = int(max_iters)
        self.early_term = bool(early_term)
        # Routing-matmul input dtype. bf16 runs the one-hot routing matmuls
        # (the kernel's dominant cost) at full MXU rate (~3x f32): the one-hot
        # operand and the hard-decision values (integers < q) are EXACT in
        # bf16, so routing still selects/sums exactly — only the probability
        # messages round to bf16 (~0.4% rel), a quantized-BP variant.
        # Opt-in (DecoderConfig default is f32); interpret-mode agreement is
        # tested in tests/test_pallas.py::test_resident_kernel_bf16_*, and
        # BER equivalence curves live in benchmarks/results/.
        self.mm_dtype = mm_dtype
        # stats_each_iter=False: hard/syndrome only after the loop (pure
        # fixed-budget throughput mode; per-frame iters stats become max_iters)
        self.stats_each_iter = bool(stats_each_iter) or self.early_term
        g = graph
        q, n, m, dc, dv = g.q, g.n, g.m, g.dc_max, g.dv_max
        self.q, self.n, self.m, self.dc, self.dv = q, n, m, dc, dv
        p = g.gf.p
        self.p = p

        cn_vn = g.cn_vn_np            # [M, dc]
        cn_mask = g.cn_mask_np        # [M, dc]
        vn_edge = g.vn_edge_np        # [N, dv] flat m*dc + j (pad = M*dc)
        vn_mask = g.vn_mask_np        # [N, dv]
        perm_down = np.asarray(g.perm_down)  # [M, dc, q]: h^-1 * a
        perm_up = np.asarray(g.perm_up)      # [M, dc, q]: h * a
        syn_k = np.asarray(g.syn_k)          # [M, dc, p]

        # Routing one-hots (f32; exact under matmul).
        E_j = np.zeros((dc, n, m), np.float32)      # expand vn -> cn slot j
        for mi in range(m):
            for j in range(dc):
                if cn_mask[mi, j]:
                    E_j[j, cn_vn[mi, j], mi] = 1.0
        B_sj = np.zeros((dv, dc, m, n), np.float32)  # cn slot j -> vn slot s
        pad_route = np.ones((dv, n), np.float32)     # 1.0 where vn lacks slot s
        for ni in range(n):
            for s in range(dv):
                if vn_mask[ni, s]:
                    e = int(vn_edge[ni, s])
                    B_sj[s, e % dc, e // dc, ni] = 1.0
                    pad_route[s, ni] = 0.0

        # GF-weight permutations as exp-order rotations: for a = alpha^i,
        # h*a = alpha^{(i+log h) mod (q-1)}, so with the q axis reordered to
        # [0, alpha^0, ..., alpha^{q-2}] the per-edge permutation is a
        # rotation of the q-1 nonzero rows by log(h). A rotation by r is
        # applied as ceil(log2(q-1)) CONDITIONAL power-of-two rotations
        # (binary decomposition of r), each a static slice-roll + per-lane
        # select — ~12 VPU ops/element instead of q*2 for dense masks.
        L = q - 1
        self.rot_bits = max(1, L.bit_length())
        lw = g.gf.log[np.maximum(g.cn_w_np, 1)]            # [M, dc] log h
        r_down = np.mod(lw, L)                              # U = roll(V, log h)
        r_up = np.mod(L - lw, L)                            # C = roll(Chat, -log h)
        def bits_of(r):
            out = np.zeros((self.rot_bits, dc, 1, m), np.float32)
            for t in range(self.rot_bits):
                out[t, :, 0, :] = ((r >> t) & 1).T
            return out
        self.rbits_down = bits_of(r_down)
        self.rbits_up = bits_of(r_up)
        # natural <-> exp-order row maps (static row permutations, free)
        self.nat_to_exp = np.concatenate(
            [[0], g.gf.exp[:L]]).astype(np.int32)           # row k reads symbol
        self.exp_to_nat = np.zeros(q, np.int32)
        for k, s in enumerate(self.nat_to_exp):
            self.exp_to_nat[s] = k

        # Pad-slot fixups: delta0 pmf on pad (m, j) slots. Shapes broadcast
        # directly over messages [q, dc, TB, M].
        padm = (~cn_mask.T).astype(np.float32)             # [dc, M]
        delta0 = np.zeros((q,), np.float32)
        delta0[0] = 1.0
        self.pad_delta = (
            delta0[:, None, None, None] * padm[None, :, None, :]
        ).astype(np.float32)                               # [q, dc, 1, M]
        self.real_mask = cn_mask.T.astype(np.float32)[None, :, None, :]  # [1,dc,1,M]

        self.E_j = E_j
        self.B_sj = B_sj
        self.pad_route = pad_route
        self.syn_k_jpm = np.ascontiguousarray(
            syn_k.transpose(1, 2, 0)
        ).astype(np.int32)                                  # [dc, p, M]

    # ---- kernel body ----------------------------------------------------

    def _kernel(self, llr_ref, ej_ref, bsj_ref, padr_ref, rbd_ref, rbu_ref,
                padd_ref, realm_ref, synk_ref, hard_ref, stats_ref):
        q, n, m, dc, dv, p = self.q, self.n, self.m, self.dc, self.dv, self.p
        TB = llr_ref.shape[1]

        L = llr_ref[...]                                  # [q, TB, N]
        # prob-domain prior: softmax over leading q (only transcendental)
        mx = L[0]
        for a in range(1, q):
            mx = jnp.maximum(mx, L[a])
        Pe = jnp.exp(L - mx[None])
        prior = Pe / jnp.sum(Pe, axis=0, keepdims=True)   # [q, TB, N]

        E = ej_ref[...]                                   # [dc, N, M]
        Bm = bsj_ref[...]                                 # [dv, dc, M, N]
        padr = padr_ref[...]                              # [dv, N]
        RBd = rbd_ref[...]                                # [T, dc, 1, M]
        RBu = rbu_ref[...]                                # [T, dc, 1, M]
        pad_delta_t = padd_ref[...]                       # [q, dc, 1, M]
        real_mask_t = realm_ref[...]                      # [1, dc, 1, M]
        synk = synk_ref[...]                              # [dc, p, M]

        mmdt = self.mm_dtype

        def dotmm(x2, w):
            # [R, K] @ [K, C] on the MXU, f32 accumulate (inputs may be bf16:
            # one-hot routing is exact; messages round to mm_dtype)
            return jax.lax.dot_general(
                x2.astype(mmdt), w.astype(mmdt), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def routes_and_posterior(Cc):
            """Cc [q, dc, TB, M] -> posterior [q, TB, N] (normalized)."""
            post = prior
            for s in range(dv):
                r = jnp.zeros((q, TB, n), jnp.float32)
                for j in range(dc):
                    r = r + dotmm(
                        Cc[:, j].reshape(q * TB, m), Bm[s, j]
                    ).reshape(q, TB, n)
                post = post * (r + padr[s][None, None, :])
            return post / jnp.sum(post, axis=0, keepdims=True)

        def hard_of(post):
            """argmax over leading q (first occurrence) -> f32 [TB, N]."""
            mx = post[0]
            for a in range(1, q):
                mx = jnp.maximum(mx, post[a])
            idx = jnp.zeros_like(mx)
            for a in range(q - 1, -1, -1):
                idx = jnp.where(post[a] >= mx, jnp.float32(a), idx)
            return idx

        def syndrome_ok(hardf):
            """[TB, N] f32 symbol indices -> done [TB, 1] f32 (1 = satisfied)."""
            acc = jnp.zeros((TB, m), jnp.int32)
            for j in range(dc):
                he = dotmm(hardf, E[j].reshape(n, m)).astype(jnp.int32)
                gx = jnp.zeros_like(he)
                for t in range(p):
                    gx = gx ^ (((he >> t) & 1) * synk[j, t][None, :])
                acc = acc ^ gx
            bad = jnp.max(acc, axis=1, keepdims=True)      # 0 iff all-zero
            return jnp.where(bad == 0, 1.0, 0.0)

        n2e = [int(v) for v in self.nat_to_exp]
        e2n = [int(v) for v in self.exp_to_nat]
        L = q - 1

        def _rows(X, order):
            return jnp.concatenate([X[k : k + 1] for k in order], axis=0)

        def perm_apply(X, RB):
            """Per-edge GF-weight permutation via conditional exp-order
            rotations. X [q, dc, TB, M]; RB [T, dc, 1, M] rotation bits."""
            Xe = _rows(X, n2e)
            Z = Xe[1:]                                    # nonzero symbols
            for t in range(self.rot_bits):
                s = (1 << t) % L
                rolled = jnp.concatenate([Z[L - s :], Z[: L - s]], axis=0)
                Z = jnp.where(RB[t] > 0.5, rolled, Z)
            out = jnp.concatenate([Xe[:1], Z], axis=0)
            return _rows(out, e2n)

        def cn_update(Ux):
            """[q, dc, TB, M] prob x-domain -> extrinsic x-domain."""
            F = _wht_lead(Ux, q)                          # pads: all-ones
            # leave-one-out product over dc via prefix/suffix (unrolled)
            pref = [None] * dc
            suf = [None] * dc
            run = jnp.ones_like(F[:, 0])
            for j in range(dc):
                pref[j] = run
                run = run * F[:, j]
            run = jnp.ones_like(F[:, 0])
            for j in range(dc - 1, -1, -1):
                suf[j] = run
                run = run * F[:, j]
            G = jnp.stack([pref[j] * suf[j] for j in range(dc)], axis=1)
            Qp = _wht_lead(G, q) / q
            Qp = jnp.maximum(Qp, PROB_FLOOR)
            return Qp / jnp.sum(Qp, axis=0, keepdims=True)

        # ---- init ----
        Cc0 = jnp.full((q, dc, TB, m), 1.0 / q, jnp.float32)
        hard0 = hard_of(prior)
        done0 = syndrome_ok(hard0)
        iters0 = jnp.zeros((TB, 1), jnp.float32)

        def body(carry):
            # posterior is carried: one route pass per iteration, not two
            Cc, post, hardf, done, iters = carry
            # leave-one-out by division (prob domain): V_e = post[vn(e)]/C_e
            Ve = jnp.stack(
                [
                    dotmm(post.reshape(q * TB, n), E[j]).reshape(q, TB, m)
                    for j in range(dc)
                ],
                axis=1,
            )
            Ve = Ve / jnp.maximum(Cc, PROB_FLOOR)
            # pad slots: numerator is 0 (E columns empty) -> replace by delta0
            Ve = Ve * real_mask_t + pad_delta_t
            Ve = Ve / jnp.sum(Ve, axis=0, keepdims=True)
            Ux = perm_apply(Ve, RBd)
            Chatx = cn_update(Ux)
            Cc_new = perm_apply(Chatx, RBu)
            post_new = routes_and_posterior(Cc_new)
            if not self.stats_each_iter:
                return (Cc_new, post_new, hardf, done, iters + (1.0 - done))
            hard_new = hard_of(post_new)
            done_new = syndrome_ok(hard_new)
            hardf2 = jnp.where(done > 0.5, hardf, hard_new)
            iters2 = iters + (1.0 - done)
            done2 = jnp.maximum(done, done_new)
            return (Cc_new, post_new, hardf2, done2, iters2)

        carry = (Cc0, routes_and_posterior(Cc0), hard0, done0, iters0)

        if self.early_term:
            def cond_body(i, carry):
                alldone = jnp.min(carry[3]) > 0.5
                return jax.lax.cond(alldone, lambda c: c, body, carry)
            carry = jax.lax.fori_loop(0, self.max_iters, cond_body, carry)
        else:
            carry = jax.lax.fori_loop(0, self.max_iters, lambda i, c: body(c), carry)

        _, post_f, hardf, done, iters = carry
        if not self.stats_each_iter:
            hardf = hard_of(post_f)
            done = syndrome_ok(hardf)
        hard_ref[...] = hardf.astype(jnp.int32)           # [TB, N]
        stats = jnp.concatenate(
            [done, iters, jnp.zeros((TB, 6), jnp.float32)], axis=1
        )
        stats_ref[...] = stats                            # [TB, 8]

    # ---- public entry ----------------------------------------------------

    def __call__(self, llr: jnp.ndarray, tb: int = 64, interpret: bool = False):
        """llr [B, N, q] -> (hard [B, N] i32, done [B] bool, iters [B] i32)."""
        B = llr.shape[0]
        q, n = self.q, self.n
        tb = min(tb, B)
        assert B % tb == 0, f"batch {B} must be a multiple of tile {tb}"
        lt = jnp.transpose(llr, (2, 0, 1))                # [q, B, N]

        grid = (B // tb,)
        consts = [
            jnp.asarray(self.E_j),
            jnp.asarray(self.B_sj),
            jnp.asarray(self.pad_route),
            jnp.asarray(self.rbits_down),
            jnp.asarray(self.rbits_up),
            jnp.asarray(self.pad_delta),
            jnp.asarray(self.real_mask),
            jnp.asarray(self.syn_k_jpm),
        ]
        const_specs = [
            pl.BlockSpec(c.shape, lambda i, _nd=c.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM)
            for c in consts
        ]
        hard, stats = pl.pallas_call(
            self._kernel,
            out_shape=(
                jax.ShapeDtypeStruct((B, n), jnp.int32),
                jax.ShapeDtypeStruct((B, 8), jnp.float32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((q, tb, n), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                *const_specs,
            ],
            out_specs=(
                pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(lt, *consts)
        done = stats[:, 0] > 0.5
        iters = stats[:, 1].astype(jnp.int32)
        return hard, done, iters


def get_resident_decoder(graph: TannerGraph, max_iters: int, early_term: bool,
                         stats_each_iter: bool = True,
                         mm_dtype=jnp.float32):
    """Build (and cache on the graph) a ResidentQSPA for this config.

    stats_each_iter=True (default) keeps fixed-budget semantics identical to
    the XLA path (hard decisions frozen at first convergence, per-frame iters
    counted). Pass False explicitly for pure throughput benchmarking — iters
    then reports max_iters (BASELINE.json fixed-50-iter throughput mode).
    """
    key = ("resident", max_iters, early_term, stats_each_iter,
           jnp.dtype(mm_dtype).name)
    cache = getattr(graph, "_resident_cache", None)
    if cache is None:
        cache = {}
        graph._resident_cache = cache
    if key not in cache:
        cache[key] = ResidentQSPA(graph, max_iters, early_term,
                                  stats_each_iter=stats_each_iter,
                                  mm_dtype=mm_dtype)
    return cache[key]
