"""Pallas K0-EMS: VMEM-resident full EMS decoder (q <= 32, nm >= q).

Round-4 build (VERDICT r3 item 3): EMS at GF(16) lost to exact QSPA
(1.87e7 vs 3.37e7 sym/s) because only its CN phase was fused (K2) while
QSPA got the whole-decode resident kernel — every iteration still paid
4 HBM round trips for gathers, VN update and syndrome. This kernel clones
the 2D frames-on-lanes K0 design (qspa_resident.ResidentQSPAFL) with the
EMS check-node body:

    messages [E, q*TB] (NATURAL symbol order — the max-plus merge scans
    need the XOR index structure), posterior/prior [N, q*TB].

Differences from the QSPA kernel:

- GF-weight permutations: natural order makes multiply-by-h a bit-LINEAR
  index map, not a lane roll. It is applied as rot_bits CONDITIONAL
  static permutes — multiply-by-alpha^(2^t) for each set bit t of
  log(h) — each a tile-aligned lane-group permute blended with the same
  exact 0/1 arithmetic as the QSPA rotations.
- CN update: the classic untruncated max-plus XOR convolution
  (nm >= q — the BASELINE GF(16) nm=16 configuration; truncated nm < q
  stays on the K2 per-phase pipeline), evaluated GROUP-WISE:
  out[a] = max_b op[b] + acc[a^b] as q fused add/max chains per output
  group — no tile broadcasts, no per-step permute materializations
  (measured cheaper than the Gray-scan form that K2 uses, which pays a
  full [*, q*TB] xor-permute + operand-tile write per scan step).
  fp-exactness: max is rounding-free and the candidate sums are
  per-element identical, so any scan order reproduces the XLA/oracle
  results bit-for-bit.
- Postprocess: per-edge max-normalize + offset correction + clip to
  [NEG, 0] — identical to decoders/ems.py::_postprocess.

Frame-exact against the XLA batch-last EMS path (decode_bl +
ems_cn_update_bl) for dv <= 2 codes — all BASELINE codes: same
normalization points, same merge association, same tie-breaking (max
ties carry equal values; argmax ties resolve to the lowest symbol).
For dv > 2 the posterior GEMM accumulates a variable's extrinsics in a
different fp ADDITION ORDER than the XLA path's slot-ordered jnp.sum
(3+ summands round order-dependently), so agreement is statistical
there. On DEVICE the routing GEMMs additionally go through the MXU's
multi-pass f32 emulation (~2^-16 relative vs true f32 adds), which can
shift a rare frame's convergence iteration — bit-exactness holds in
interpret mode, near-exactness on the chip. Tested in
tests/test_pallas.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbldpc_tpu.decoders.ems import NEG
from nbldpc_tpu.graph import TannerGraph
from nbldpc_tpu.kernels.qspa_resident import ResidentQSPAFL


class ResidentEMS(ResidentQSPAFL):
    """Whole-decode EMS kernel for one (graph, max_iters, offset) config."""

    def __init__(self, graph: TannerGraph, max_iters: int,
                 nm: int | None = None, offset: float = 0.0,
                 early_term: bool = True, stats_each_iter: bool = True,
                 mm_dtype=jnp.float32, ablate: str = ""):
        # ablate: same attribution-probe contract as the parent kernel
        # (benchmarks/bench_resident.py --ablate): "rot" skips the GF-weight
        # multiply permutes, "lou" the max-plus merge core, "route" both
        # routing GEMMs. Round-4 advisor finding: this parameter was missing,
        # so the EMS ablation sweep silently measured the unablated kernel.
        super().__init__(graph, max_iters, early_term,
                         stats_each_iter=stats_each_iter, mm_dtype=mm_dtype,
                         ablate=ablate)
        q = graph.q
        if nm is None:
            nm = q
        # nm < q (round 5, VERDICT item 7): the classic truncated-list
        # scheme runs whole-decode resident too — top-nm extraction over
        # lane groups (positional, stable ties -> lower GF index, exactly
        # decoders/ems._top_extract) feeding the same max-plus merge core
        # with (NEG-masked list, compensated dense) operand pairs. fp-exact
        # vs the XLA classic path: max is order-independent, extraction
        # tie-breaks mirrored, blends use exact 0/1 masks.
        self.nm = min(nm, q)
        self.offset = float(offset)
        g = graph
        gf = g.gf
        L = q - 1
        Mp, dc, m = self.m_pad, self.dc, self.m
        E2 = self.e2
        # natural-order multiply permutation, decomposed over the bits of
        # log(h): stage t conditionally applies x -> alpha^(2^t) * x.
        # Down (c -> x domain): U[x] = V[h^{-1} x]  => exponent (L - l) % L
        # Up   (x -> c domain): C[c] = O[h c]       => exponent l
        self.mult_maps = []
        for t in range(self.rot_bits):
            gpow = int(gf.exp[(1 << t) % L])
            self.mult_maps.append([int(gf.mul[gpow, x]) for x in range(q)])
        lw = gf.log[np.maximum(g.cn_w_np, 1)]                  # [M, dc]
        e_down = np.mod(L - lw, L)
        e_up = np.mod(lw, L)

        def bits2(r):
            out = np.zeros((self.rot_bits, E2, 1), np.float32)
            for t in range(self.rot_bits):
                for j in range(dc):
                    out[t, j * Mp:j * Mp + m, 0] = (r[:, j] >> t) & 1
            return out

        # stored into the slots the parent __call__ already ships to the
        # kernel — the const list/specs are inherited unchanged
        self.rbits_down2 = bits2(e_down)
        self.rbits_up2 = bits2(e_up)
        # STATIC permutation path (round 5, mirrors the parent's
        # rot_static): where the edge weight is uniform over aligned 8-row
        # chunks (QC codes), the conditional multiply-by-alpha^(2^t) blend
        # stages collapse to ONE static lane-group permute per chunk (the
        # full multiply-by-h map). Chunk with the weight itself as the
        # uniformity key (pads default to weight 1 = identity; their
        # values are overwritten by the delta fix / never routed up).
        self.perm_static = None
        if q >= 8:                   # see the parent's q-gate rationale
            wch = self._rot_chunks(np.maximum(g.cn_w_np, 1), g.cn_mask_np)
            if wch is not None:
                wch = [(r0, r1, max(1, w)) for (r0, r1, w) in wch]
                self.perm_static = (
                    [(r0, r1,
                      [int(gf.mul[gf.inv[w], x]) for x in range(q)])
                     for (r0, r1, w) in wch],
                    [(r0, r1, [int(gf.mul[w, x]) for x in range(q)])
                     for (r0, r1, w) in wch],
                )
        # EMS pads: EVERY pad row (irregular-code slots and structural
        # mi >= m rows) must hold the merge identity delta0 = [0, NEG, ...]
        # — a NEG-free garbage row would feed max-plus merges of real rows'
        # checks? No: merges stay row-aligned, but normalize/max chains on
        # garbage rows can produce NaN that jnp.maximum would propagate
        # within that row only; forcing delta0 keeps everything finite.
        self.force_padfix = bool((self.real2[:, 0] == 0).any())

    # ---- kernel body ----------------------------------------------------

    def _kernel(self, llr_ref, wd_ref, rbd_ref, rbu_ref, real_ref, synk_ref,
                hard_ref, stats_ref, lc_ref, post_ref):
        q, n, m, dc, p = self.q, self.n, self.m, self.dc, self.p
        Mp, E2 = self.m_pad, self.e2
        TB = llr_ref.shape[2]
        mdt = self.mm_dtype
        neg = jnp.float32(NEG)

        def grp(X, a, w=1):
            return X[:, a * TB:(a + w) * TB]

        # [N, q, TB] -> [N, q*TB] natural-order groups, max-normalized
        # (decode_bl's llr normalization)
        Lr = llr_ref[...].reshape(n, q * TB)
        mx = Lr[:, :TB]
        for a in range(1, q):
            mx = jnp.maximum(mx, Lr[:, a * TB:(a + 1) * TB])
        prior = (Lr - jnp.concatenate([mx] * q, axis=1)).astype(mdt)

        Wd = wd_ref[...]                                   # [E2, N]
        RBd = rbd_ref[...]                                 # [T, E2, 1]
        RBu = rbu_ref[...]
        real = real_ref[...]                               # [E2, 1]
        synk = synk_ref[...]                               # [dc, p, Mp]

        def dotg(a, b, dims, adt=None):
            return jax.lax.dot_general(
                a.astype(adt or mdt), b.astype(adt or mdt), (dims, ((), ())),
                preferred_element_type=jnp.float32)

        def route_down(post2):
            return dotg(Wd, post2, ((1,), (0,))).astype(mdt)

        def route_up():
            r = dotg(Wd, lc_ref[...], ((0,), (0,)))
            return prior + r.astype(mdt)

        def gperm(X, RB):
            """Conditional multiply permutation across lane groups. With
            per-slot-uniform weights (perm_static), ONE static lane-group
            permute per slot block replaces all blend stages."""
            if "rot" in self.ablate:
                return X
            if self.perm_static is not None:
                chunks = self.perm_static[0 if RB is RBd else 1]
                ident = list(range(q))
                return jnp.concatenate([
                    X[r0:r1] if mp == ident else
                    jnp.concatenate([grp(X[r0:r1], mp[x])
                                     for x in range(q)], axis=1)
                    for (r0, r1, mp) in chunks], axis=0)
            one = jnp.asarray(1.0, X.dtype)
            for t in range(self.rot_bits):
                mm = self.mult_maps[t]
                Pt = jnp.concatenate([grp(X, mm[x]) for x in range(q)],
                                     axis=1)
                b = RB[t].astype(X.dtype)
                X = X * (one - b) + Pt * b
            return X

        def groupmax(X):
            s = grp(X, 0)
            for a in range(1, q):
                s = jnp.maximum(s, grp(X, a))
            return s

        def merge(accB, opB):
            """Untruncated max-plus XOR convolution of two row blocks:
            out[a] = max_b op[b] + acc[a ^ b]. Group-wise fused chains —
            max is rounding-free, so scan order is irrelevant for
            exactness."""
            outs = []
            for a in range(q):
                run = None
                for b in range(q):
                    cand = grp(opB, b) + grp(accB, a ^ b)
                    run = cand if run is None else jnp.maximum(run, cand)
                outs.append(run)
            return jnp.concatenate(outs, axis=1)

        def extract(X):
            """Positional top-nm over lane groups -> (lst, dense): entries
            outside the stable top-nm become NEG in the LIST form and the
            COMPENSATION value (smallest kept) in the DENSE form — exactly
            decoders/ems._top_extract. All comparisons f32; blends use
            exact 0/1 mask products (no bf16 compares — Mosaic)."""
            X32 = X.astype(jnp.float32)
            run = X32
            kept = jnp.zeros_like(X32)
            comp = None
            for _ in range(self.nm):
                mx = groupmax(run)
                idx = jnp.full_like(mx, q)
                for a in range(q - 1, -1, -1):
                    idx = jnp.where(grp(run, a) >= mx, jnp.float32(a), idx)
                comp = mx
                run = jnp.concatenate(
                    [jnp.where(idx == a, neg, grp(run, a))
                     for a in range(q)], axis=1)
                kept = jnp.concatenate(
                    [jnp.maximum(grp(kept, a),
                                 jnp.where(idx == a, 1.0, 0.0))
                     for a in range(q)], axis=1)
            lst = X32 * kept + neg * (1.0 - kept)
            compb = jnp.concatenate([comp] * q, axis=1)
            dense = X32 * kept + compb * (1.0 - kept)
            return lst, dense

        def cn_update(U):
            """[E2, q*TB] x-domain in/out. decoders/ems.py::_cn_ems_core
            forward/backward structure: untruncated (nm >= q) keeps all
            operands dense (extract = identity); truncated runs the classic
            (list, compensated-dense) recursion — merge(acc.dense, op.lst),
            re-extracted after every merge. "lou" in ablate skips the
            merges (numbers wrong by design — the attribution probe, like
            the QSPA kernel's flag set)."""
            if "lou" in self.ablate:
                mo = jnp.concatenate([groupmax(U)] * q, axis=1)
                return jnp.maximum(jnp.minimum(U - mo, 0.0), neg)
            trunc = self.nm < q
            if trunc:
                lstA, denA = extract(U)
                Ujs = [(lstA[j * Mp:(j + 1) * Mp],
                        denA[j * Mp:(j + 1) * Mp]) for j in range(dc)]
                mrg = lambda acc, op: merge(acc[1], op[0])
                ext = extract
            else:
                Ujs = [(U[j * Mp:(j + 1) * Mp],) * 2 for j in range(dc)]
                mrg = lambda acc, op: merge(acc[1], op[0])
                ext = lambda x: (x, x)
            F = [None] * dc
            F[1] = Ujs[0]
            for j in range(2, dc):
                F[j] = ext(mrg(F[j - 1], Ujs[j - 1]))
            B_ = [None] * dc
            B_[dc - 2] = Ujs[dc - 1]
            for j in range(dc - 3, -1, -1):
                B_[j] = ext(mrg(B_[j + 1], Ujs[j + 1]))
            outs = []
            for j in range(dc):
                if j == 0:
                    outs.append(B_[0][1])
                elif j == dc - 1:
                    outs.append(F[dc - 1][1])
                else:
                    outs.append(mrg(F[j], B_[j]))
            O = jnp.concatenate(outs, axis=0)              # [E2, q*TB]
            # _postprocess: normalize, offset-correct, clip to [NEG, 0]
            mo = jnp.concatenate([groupmax(O)] * q, axis=1)
            O = O - mo
            if self.offset:
                O = O + jnp.float32(self.offset)
            return jnp.maximum(jnp.minimum(O, 0.0), neg)

        def hard_of(post2):
            """argmax over natural-order groups (ties -> lowest symbol)."""
            post2 = post2.astype(jnp.float32)
            mxp = groupmax(post2)
            idx = jnp.zeros_like(mxp)
            for k in range(q - 1, -1, -1):
                idx = jnp.where(grp(post2, k) >= mxp, jnp.float32(k), idx)
            return idx

        def syndrome_ok(hardf):
            acc = jnp.zeros((Mp, TB), jnp.int32)
            for j in range(dc):
                he = dotg(Wd[j * Mp:(j + 1) * Mp], hardf, ((1,), (0,)),
                          adt=jnp.float32).astype(jnp.int32)
                gx = jnp.zeros_like(he)
                for t in range(p):
                    gx = gx ^ (((he >> t) & 1) * synk[j, t][:, None])
                acc = acc ^ gx
            bad = jnp.max(acc, axis=0, keepdims=True)
            return jnp.where(bad == 0, 1.0, 0.0)

        # ---- init ----
        lc_ref[...] = jnp.zeros((E2, q * TB), mdt)
        post_ref[...] = prior
        hard0 = hard_of(prior)
        done0 = syndrome_ok(hard0)
        iters0 = jnp.zeros((1, TB), jnp.float32)
        d0 = jnp.concatenate(
            [jnp.zeros((1, TB), jnp.float32),
             jnp.full((1, (q - 1) * TB), NEG, jnp.float32)], axis=1)

        def body(carry):
            hardf, done, iters = carry
            # VN phase: leave-one-out + per-edge max-normalize (decode_bl's
            # Vv normalization), then the down permutation into x-domain
            if "route" in self.ablate:
                Ve = lc_ref[...] * jnp.asarray(1.0, mdt)
            else:
                Ve = route_down(post_ref[...]) - lc_ref[...]
            Ve = Ve - jnp.concatenate([groupmax(Ve)] * q, axis=1)
            U = gperm(Ve, RBd)
            if self.force_padfix:
                U = U * real + d0 * (1.0 - real)
            # CN phase in x-domain, then back to c-domain for storage
            lc_ref[...] = gperm(cn_update(U), RBu).astype(mdt)
            if "route" in self.ablate:
                sal = jnp.sum(lc_ref[...], axis=0).reshape(1, q * TB)
                post_ref[...] = prior + (
                    sal * jnp.asarray(1e-9, mdt)).astype(mdt)
            else:
                post_ref[...] = route_up()
            if not self.stats_each_iter:
                return (hardf, done, iters + (1.0 - done))
            hard_new = hard_of(post_ref[...])
            done_new = syndrome_ok(hard_new)
            hardf2 = jnp.where(done > 0.5, hardf, hard_new)
            iters2 = iters + (1.0 - done)
            done2 = jnp.maximum(done, done_new)
            return (hardf2, done2, iters2)

        carry = (hard0, done0, iters0)
        if self.early_term:
            def cond_body(i, carry):
                alldone = jnp.min(carry[1]) > 0.5
                return jax.lax.cond(alldone, lambda c: c, body, carry)
            carry = jax.lax.fori_loop(0, self.max_iters, cond_body, carry)
        else:
            carry = jax.lax.fori_loop(0, self.max_iters,
                                      lambda i, c: body(c), carry)

        hardf, done, iters = carry
        if not self.stats_each_iter:
            hardf = hard_of(post_ref[...])
            done = syndrome_ok(hardf)
        hard_ref[...] = hardf.astype(jnp.int32)
        stats_ref[...] = jnp.concatenate(
            [done, iters, jnp.zeros((6, TB), jnp.float32)], axis=0)


def get_resident_ems(graph: TannerGraph, max_iters: int, nm: int,
                     offset: float, early_term: bool,
                     stats_each_iter: bool = True, mm_dtype=jnp.float32):
    """Build (and cache on the graph) a ResidentEMS for this config."""
    key = ("resident_ems", max_iters, nm, float(offset), early_term,
           stats_each_iter, jnp.dtype(mm_dtype).name)
    cache = getattr(graph, "_resident_cache", None)
    if cache is None:
        cache = {}
        graph._resident_cache = cache
    if key not in cache:
        cache[key] = ResidentEMS(graph, max_iters, nm=nm, offset=offset,
                                 early_term=early_term,
                                 stats_each_iter=stats_each_iter,
                                 mm_dtype=mm_dtype)
    return cache[key]
