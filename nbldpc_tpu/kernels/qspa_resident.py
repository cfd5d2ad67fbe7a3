"""Pallas K0: VMEM-resident full QSPA decoder — the flagship TPU kernel.

One kernel invocation decodes TB frames for ALL max_iters iterations with the
message tensors resident in VMEM: HBM traffic is one LLR read and one
hard-decision write per frame, total — the true speed-of-light design point
(BASELINE.json "speed-of-light HBM bandwidth"). This is what replaces the
reference genre's C++ decoder inner loops (SURVEY.md §2.2) at the whole-
decoder granularity rather than per-phase.

TWO layouts live here. `ResidentQSPAFL` (round 4, frames-on-lanes 2D —
see its docstring) is the dispatch default for 128-multiple batches;
`ResidentQSPA` below (round 2/3, checks-on-lanes) remains the
small-batch fallback and the semantic twin the FL kernel is fp-exact
against.

Round-2 design of the checks-on-lanes kernel (VPU-bound, measured
~3.2e12 VPU ops/s at the v5e vector-unit ceiling in the round-1 shape;
every change below trades VPU passes for idle MXU cycles or deletes work
outright):

- Layout [q, dc, TB, M]: GF symbols on the leading axis, frames on sublanes,
  checks on lanes. Messages are carried in the EXP-ORDER basis
  (rows = [0, alpha^0, ..., alpha^{q-2}]) for the whole decode, so per-edge
  GF-weight permutations are pure conditional rotations — the natural<->exp
  basis reorders are folded into the WHT matmul operands (free).
- LOG-DOMAIN routing: posterior = prior + sum_j logC_j @ E_j^T. Down and up
  are dc one-hot matmuls each on the MXU (exact for selection matrices);
  leave-one-out is a subtraction. 2*dc matmuls/iter total vs the round-1
  prob-domain (dv+1)*dc.
- WHT ON THE MXU: the [q, dc, *] <-> flattened [q*dc, TB*M] reshape is free
  (leading axes), so the WHT along q is one [q*dc, q*dc] matmul with the
  block-diagonal Hadamard operator — with the exp->nat input reorder folded
  into the forward operator and nat->exp + the 1/q scale folded into the
  inverse operator. Kills ~24 VPU passes/iteration from the round-1 design.
- Normalizations deleted by invariants instead of computed: log-messages and
  the posterior are always <= 0 and >= log(PROB_FLOOR), so the CN softmax
  needs no max-subtraction (exp bounded by 1/PROB_FLOOR) and neither the
  extrinsics nor the posterior are renormalized (BP is shift-invariant).
- CN leave-one-out via direct prefix/suffix spectrum products (|F| <= 1 for
  pmf spectra — cannot overflow); the only transcendentals per iteration are
  the softmax exp and one log.
- Syndrome via GF bit-decomposition (int ops), per-frame done/iters
  bookkeeping inside the kernel; optional whole-block early exit.

Requires q * dc * TB * M * 4B * ~5 live arrays to fit VMEM — the standard
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
from nbldpc_tpu.kernels.wht import wht_matrix

PROB_FLOOR = 1e-12


class ResidentQSPA:
    """Builds the resident-decode kernel for one (graph, max_iters) config."""

    def __init__(self, graph: TannerGraph, max_iters: int, early_term: bool = True,
                 stats_each_iter: bool = True, mm_dtype=jnp.float32,
                 wht_impl: str = "vpu", ablate: str = "", rot_impl: str = "b2"):
        if graph.q > 256:
            raise ValueError("resident kernel supports q <= 256")
        # rot_impl: "b2" = binary conditional-roll rotation stages; "b4" =
        # radix-4 digits, half the stages at 4-way blends (FL kernel only)
        self.rot_impl = rot_impl
        self.graph = graph
        self.max_iters = int(max_iters)
        self.early_term = bool(early_term)
        # WHT implementation: "vpu" = explicit-slice butterflies (p stages,
        # ~2 VPU passes each) bracketed by one exp<->nat basis reorder pair
        # per iteration; "mxu" = one [q*dc, q*dc] rank-3 dot_general per WHT
        # with the basis reorders folded into the operator (zero VPU cost,
        # but Mosaic compiles the in-loop rank-3 contraction very slowly).
        self.wht_impl = wht_impl
        # Profiling aid (benchmarks/bench_resident.py --ablate, SURVEY §5.1):
        # comma-separated phases to REMOVE from the loop so their cost can be
        # attributed by differencing step times (a fused VMEM-resident kernel
        # has no per-op trace). Results are numerically wrong under ablation.
        # Flags: "rot" (GF-weight rotations), "wht" (both WHTs + reorders),
        # "route" (both routing matmuls), "trans" (exp/log transcendentals),
        # "lou" (leave-one-out spectrum products).
        self.ablate = frozenset(a for a in ablate.split(",") if a)
        # Storage/matmul dtype for the LOG-DOMAIN tensors (lC, posterior,
        # prior, Ve) and the routing matmuls. bf16 runs the MXU at full rate
        # (~2-3x f32) and halves VMEM bytes/pass on every pass touching a
        # stored tensor: the one-hot routing operand and the 0/1 rotation
        # blends are EXACT in bf16, and log-domain values only round by
        # ~0.4% of magnitude (<= 0.1 absolute at the -27.6 floor) — a
        # benign log-quantized-BP variant.
        #
        # The PROBABILITY-DOMAIN stretch (softmax exp -> WHT -> leave-one-
        # out spectrum products -> iWHT -> log) always runs f32, regardless
        # of mm_dtype: spectra carry absolute (not relative) error through
        # the iWHT sum, so bf16 there wipes out every log-tail below
        # ~ -log(q * 2^-9) ~ -7.6 while BP needs tails to log(PROB_FLOOR) =
        # -27.6. Measured on device (round 3): all-bf16 converged 155/256
        # frames at Eb/N0 = 2.0 dB where f32 converged 252/256; this mixed
        # scheme is BER-checked by benchmarks/ber_precision.py and the
        # on-device test in tests/test_pallas.py.
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
        syn_k = np.asarray(g.syn_k)          # [M, dc, p]

        # Routing one-hots (exact under matmul). E_j[j, n, m] = 1 iff edge
        # (m, j) connects variable n. Down: Ve[:, j] = post @ E_j - lC[:, j].
        # Up: post = prior + sum_j lC[:, j] @ E_j^T (contract E_j dim 0).
        E_j = np.zeros((dc, n, m), np.float32)
        for mi in range(m):
            for j in range(dc):
                if cn_mask[mi, j]:
                    E_j[j, cn_vn[mi, j], mi] = 1.0

        # GF-weight permutations as exp-order rotations: for a = alpha^i,
        # h*a = alpha^{(i+log h) mod (q-1)}, so in the exp-order basis
        # [0, alpha^0, ..., alpha^{q-2}] the per-edge permutation is a
        # rotation of the q-1 nonzero rows by log(h), applied as
        # ceil(log2(q-1)) CONDITIONAL power-of-two rotations (binary
        # decomposition of log h), each a static slice-roll + per-lane select.
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
        # exp-order basis: row k holds symbol n2e[k]
        self.nat_to_exp = np.concatenate(
            [[0], g.gf.exp[:L]]).astype(np.int32)
        self.exp_to_nat = np.zeros(q, np.int32)
        for k, s in enumerate(self.nat_to_exp):
            self.exp_to_nat[s] = k

        # WHT operators on the flattened [q*dc, TB*M] view with the basis
        # reorders folded in (see module docstring):
        #   forward  A1[(a,j),(k,j')] = H[a, n2e[k]] delta_jj'   (exp -> nat)
        #   inverse  A2[(k,j),(b,j')] = H[n2e[k], b]/q delta_jj' (nat -> exp)
        # All entries are +-1 (or +-1/q, an exact power of two) — exact bf16.
        H = wht_matrix(q).astype(np.float32)
        n2e = self.nat_to_exp
        A1 = np.zeros((q * dc, q * dc), np.float32)
        A2 = np.zeros((q * dc, q * dc), np.float32)
        for j in range(dc):
            A1[j::dc, j::dc] = H[:, n2e]
            A2[j::dc, j::dc] = H[n2e, :] / q
        self.A1 = A1
        self.A2 = A2

        # Pad-slot fixups (irregular codes only): delta0 pmf on pad (m, j)
        # CN-input slots, in the exp-order basis (symbol 0 is row 0 in both).
        padm = (~cn_mask.T).astype(np.float32)             # [dc, M]
        delta0 = np.zeros((q,), np.float32)
        delta0[0] = 1.0
        self.pad_delta = (
            delta0[:, None, None, None] * padm[None, :, None, :]
        ).astype(np.float32)                               # [q, dc, 1, M]
        self.real_mask = cn_mask.T.astype(np.float32)[None, :, None, :]  # [1,dc,1,M]
        self.has_pads = bool(padm.any())

        self.E_j = E_j
        self.syn_k_jpm = np.ascontiguousarray(
            syn_k.transpose(1, 2, 0)
        ).astype(np.int32)                                  # [dc, p, M]

    # ---- kernel body ----------------------------------------------------

    def _kernel(self, llr_ref, ej_ref, *rest):
        # A1/A2 (the [q*dc, q*dc] MXU-WHT operators) ship only in mxu mode:
        # at q = 256 they are 12.8 MB each of VMEM consts the vpu path
        # never reads (round-5 large-q extension).
        if self.wht_impl == "mxu":
            (a1_ref, a2_ref, rbd_ref, rbu_ref, padd_ref, realm_ref,
             synk_ref, hard_ref, stats_ref) = rest
        else:
            (rbd_ref, rbu_ref, padd_ref, realm_ref, synk_ref,
             hard_ref, stats_ref) = rest
        q, n, m, dc, dv, p = self.q, self.n, self.m, self.dc, self.dv, self.p
        TB = llr_ref.shape[1]

        n2e = [int(v) for v in self.nat_to_exp]
        L = q - 1

        def _rows(X, order):
            return jnp.concatenate([X[k : k + 1] for k in order], axis=0)

        mdt = self.mm_dtype

        Lr = llr_ref[...]                                 # [q, TB, N] natural
        # exp-order log prior, normalized once so max over q = 0 (keeps the
        # <=0 invariant that makes all later normalizations unnecessary).
        # In bf16 mode ALL message tensors are stored bf16: the kernel is
        # VMEM-bandwidth bound (measured via --ablate: removing both routing
        # matmuls changes step time by <2%), so halving bytes/pass is the
        # dominant lever; bf16-quantized BP is BER-validated in
        # benchmarks/results/.
        mx = Lr[0]
        for a in range(1, q):
            mx = jnp.maximum(mx, Lr[a])
        prior = _rows(Lr - mx[None], n2e).astype(mdt)     # [q, TB, N] exp-order

        E = ej_ref[...]                                   # [dc, N, M]
        if self.wht_impl == "mxu":
            A1 = a1_ref[...]                              # [q*dc, q*dc]
            A2 = a2_ref[...]                              # [q*dc, q*dc]
        RBd = rbd_ref[...]                                # [T, dc, 1, M]
        RBu = rbu_ref[...]                                # [T, dc, 1, M]
        pad_delta_t = padd_ref[...]                       # [q, dc, 1, M]
        real_mask_t = realm_ref[...]                      # [1, dc, 1, M]
        synk = synk_ref[...]                              # [dc, p, M]

        def dotmm(x2, w, dims=(((1,), (0,)), ((), ()))):
            # [R, K] (x) [K, C] on the MXU, f32 accumulate (inputs may be
            # bf16: one-hot/Hadamard operands are exact; messages round)
            return jax.lax.dot_general(
                x2.astype(mdt), w.astype(mdt), dims,
                preferred_element_type=jnp.float32,
            )

        def route_down(post):
            """post [q, TB, N] log -> [q, dc, TB, M]: V slot values."""
            p2 = post.reshape(q * TB, n)
            return jnp.stack(
                [dotmm(p2, E[j]).astype(mdt).reshape(q, TB, m)
                 for j in range(dc)],
                axis=1,
            )

        def route_up(lC):
            """lC [q, dc, TB, M] log -> posterior [q, TB, N] (<= 0)."""
            acc = None
            for j in range(dc):
                r = dotmm(
                    lC[:, j].reshape(q * TB, m), E[j],
                    dims=(((1,), (1,)), ((), ())),
                )
                acc = r if acc is None else acc + r
            return prior + acc.astype(mdt).reshape(q, TB, n)

        def wht_mxu(X, A):
            """WHT along the leading q axis as ONE MXU contraction on the
            free [q*dc, TB, M] leading-axis merge (rank-3 dot_general —
            Mosaic rejects flattening the minor (TB, M) dims); basis reorder
            + 1/q scale live in A. Runs f32 ALWAYS (prob-domain spectra
            carry absolute error — see mm_dtype note)."""
            return jax.lax.dot_general(
                A.astype(jnp.float32),
                X.astype(jnp.float32).reshape(q * dc, TB, m),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(q, dc, TB, m)

        def wht_vpu(X):
            """Unnormalized natural-order WHT along leading axis 0: p stages
            of explicit half-block add/sub + concat (~2 VPU passes each; the
            static per-row signs are in the slicing, not a select)."""
            for i in range(p):
                h = 1 << i
                pieces = []
                for b in range(0, q, 2 * h):
                    lo = X[b : b + h]
                    hi = X[b + h : b + 2 * h]
                    pieces.append(lo + hi)
                    pieces.append(lo - hi)
                X = jnp.concatenate(pieces, axis=0)
            return X

        def hard_of(post):
            """argmax over exp-order rows -> NATURAL symbol, f32 [TB, N].
            Row iteration is by descending symbol so fp ties resolve to the
            lowest natural symbol, matching jnp.argmax in the XLA path.

            Runs entirely in f32 even in bf16 mode: an i1 mask produced by a
            bf16 compare feeding an f32 select needs a (16,128)->(8,128)
            mask relayout that Mosaic rejects ("Invalid relayout ...
            vector<TBxNxi1>" — the round-2 on-device bf16 compile failure)."""
            post = post.astype(jnp.float32)
            mx = post[0]
            for a in range(1, q):
                mx = jnp.maximum(mx, post[a])
            order = sorted(range(q), key=lambda k: -n2e[k])
            idx = jnp.zeros_like(mx)
            for k in order:
                idx = jnp.where(post[k] >= mx, jnp.float32(n2e[k]), idx)
            return idx

        def syndrome_ok(hardf):
            """[TB, N] f32 symbol values -> done [TB, 1] f32 (1 = satisfied)."""
            acc = jnp.zeros((TB, m), jnp.int32)
            for j in range(dc):
                he = dotmm(hardf, E[j]).astype(jnp.int32)
                gx = jnp.zeros_like(he)
                for t in range(p):
                    gx = gx ^ (((he >> t) & 1) * synk[j, t][None, :])
                acc = acc ^ gx
            bad = jnp.max(acc, axis=1, keepdims=True)      # 0 iff all-zero
            return jnp.where(bad == 0, 1.0, 0.0)

        def rotate(X, RB):
            """Per-edge exp-order rotation of the q-1 nonzero rows.
            X [q, dc, TB, M]; RB [T, dc, 1, M] rotation bits of log h."""
            if "rot" in self.ablate:
                return X
            Z = X[1:]
            # Conditional rolls as arithmetic blends: RB is exactly 0/1, so
            # Z*(1-b) + rolled*b selects without any compare, and (unlike
            # Z + b*(rolled-Z), whose subtraction rounds) each product is
            # EXACT — one operand is 0.0 or 1.0. Mosaic on this target
            # supports neither bf16 cmpf nor the i1 mask relayout an
            # f32-compare + bf16-select pair needs (the round-2 on-device
            # bf16 compile failures), hence no jnp.where here.
            one = jnp.asarray(1.0, X.dtype)
            for t in range(self.rot_bits):
                s = (1 << t) % L
                rolled = jnp.concatenate([Z[L - s :], Z[: L - s]], axis=0)
                b = RB[t].astype(X.dtype)
                Z = Z * (one - b) + rolled * b
            return jnp.concatenate([X[:1], Z], axis=0)

        e2n = [int(v) for v in self.exp_to_nat]

        def cn_update(Ux):
            """[q, dc, TB, M] prob (exp-order) -> log extrinsic (exp-order).

            Spectra of pmfs satisfy |F| <= 1, so prefix/suffix leave-one-out
            products cannot overflow and Q = iWHT(G)/q <= 1: after the floor,
            log Q in [log PROB_FLOOR, 0] — no renormalization needed."""
            if "wht" in self.ablate:
                F = Ux
            elif self.wht_impl == "mxu":
                F = wht_mxu(Ux, A1)                       # nat-order spectra
            else:
                # vpu mode receives Ux already in NATURAL order: the
                # exp->nat reorder is folded into softmax_q's output concat
                # (free — same per-element arithmetic, round-5 large-q fold)
                F = wht_vpu(Ux)
            if "lou" in self.ablate:
                G = F
            else:
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
            if "wht" in self.ablate:
                Q = G
            elif self.wht_impl == "mxu":
                Q = wht_mxu(G, A2)                        # exp-order, /q folded
            else:
                # fold the nat->exp reorder + 1/q scale + floor + log into
                # ONE output concat (per-element arithmetic unchanged ->
                # fp-exact vs the separate-pass form; saves 2 full passes
                # per iteration — decisive at q = 256 where a reorder is a
                # 256-row permute copy)
                W = wht_vpu(G)
                if "trans" in self.ablate:
                    return jnp.concatenate(
                        [jnp.maximum(W[k : k + 1] * (1.0 / q), PROB_FLOOR)
                         for k in n2e], axis=0)
                return jnp.concatenate(
                    [jnp.log(jnp.maximum(W[k : k + 1] * (1.0 / q),
                                         PROB_FLOOR))
                     for k in n2e], axis=0)
            if "trans" in self.ablate:
                return jnp.maximum(Q, PROB_FLOOR)
            return jnp.log(jnp.maximum(Q, PROB_FLOOR))

        def softmax_q(X, order=None):
            """exp + normalize over leading q, ALWAYS f32 out (start of the
            prob-domain stretch — see mm_dtype note). X = post - lC <= -log
            PROB_FLOOR ~ 27.6 (post <= 0, lC >= log floor), so the exp
            cannot overflow f32 and no max-subtraction pass is needed.

            `order` permutes the OUTPUT rows inside the same concat that
            writes the division result (the exp->nat basis reorder rides
            the softmax materialization for free, as in the FL kernel)."""
            X = X.astype(jnp.float32)
            Ex = X if "trans" in self.ablate else jnp.exp(X)
            S = jnp.sum(Ex, axis=0, keepdims=True)
            if order is None:
                return Ex / S
            return jnp.concatenate([Ex[k : k + 1] / S for k in order],
                                   axis=0)

        # ---- init ----
        lC0 = jnp.zeros((q, dc, TB, m), mdt)
        hard0 = hard_of(prior)
        done0 = syndrome_ok(hard0)
        iters0 = jnp.zeros((TB, 1), jnp.float32)

        def body(carry):
            # posterior is carried: one route pass per iteration, not two
            lC, post, hardf, done, iters = carry
            # leave-one-out by subtraction (log domain): V_e = post - lC_e
            if "route" in self.ablate:
                # keep the dataflow (so nothing is dead-code-eliminated)
                # while replacing both matmuls with near-free reductions
                Ve = lC + jnp.sum(post, axis=2, keepdims=True)[:, None] * 1e-9
            else:
                Ve = route_down(post) - lC
            # vpu mode: softmax emits NAT order (reorder folded); cn_update
            # returns exp order (reorder folded into its final log concat).
            # mxu mode: the reorders live inside the A1/A2 operators.
            Ux = softmax_q(rotate(Ve, RBd),
                           order=None if self.wht_impl == "mxu" else e2n)
            if self.has_pads:
                # pad CN slots: replace by delta0 (the WHT identity)
                Ux = Ux * real_mask_t + pad_delta_t
            # log extrinsics quantize to the storage dtype only AFTER the
            # f32 prob-domain stretch (cast before the exact 0/1 rotation)
            lC_new = rotate(cn_update(Ux).astype(mdt), RBu)
            if "route" in self.ablate:
                post_new = prior + jnp.sum(lC_new, axis=(1, 3))[..., None] * 1e-9
            else:
                post_new = route_up(lC_new)
            if not self.stats_each_iter:
                return (lC_new, post_new, hardf, done, iters + (1.0 - done))
            hard_new = hard_of(post_new)
            done_new = syndrome_ok(hard_new)
            hardf2 = jnp.where(done > 0.5, hardf, hard_new)
            iters2 = iters + (1.0 - done)
            done2 = jnp.maximum(done, done_new)
            return (lC_new, post_new, hardf2, done2, iters2)

        carry = (lC0, prior, hard0, done0, iters0)

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
        consts = [jnp.asarray(self.E_j)]
        if self.wht_impl == "mxu":
            consts += [jnp.asarray(self.A1), jnp.asarray(self.A2)]
        consts += [
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
            # large q (the round-5 q <= 256 extension) overflows the default
            # 16M scoped-vmem limit: the loop keeps ~6 live [q, dc, TB, M]
            # full tensors; the chip's physical VMEM is >= 120M
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(lt, *consts)
        done = stats[:, 0] > 0.5
        iters = stats[:, 1].astype(jnp.int32)
        return hard, done, iters


class ResidentQSPAFL(ResidentQSPA):
    """K0 with the round-4 FRAMES-ON-LANES 2D layout (VERDICT r3, item 1).

    The round-2/3 layout [q, dc, TB, M] put checks on the 128-lane axis:
    M=102 pads to 128 (20% of every VPU pass wasted; GF(4)'s M=48 wastes
    2.7x) in a kernel that is measured VPU-pass bound. This layout is 2D:

        messages  [E, q*TB]       posterior/prior  [N, q*TB]

    where E = dc * Mp edge-slot rows (Mp = M sublane-padded to 8, ~2%
    waste), and the lane axis is q GROUPS of TB=128 frames (zero pad).
    Every former q-axis operation becomes a TILE-ALIGNED lane-group op:
    GF rotations roll lane groups, WHT butterflies add/sub lane-group
    halves, the softmax reduces across groups — all at 100% lane
    utilization (measured 2.4x per-frame speedup on the rotation+softmax
    chain, benchmarks/micro_layout.py).

    Routing is the reason for the 2D shape: a first rank-4 rewrite
    [q, dc, M, TB] kept q leading, but dot_general's output-order rule
    (batch, lhs_free, rhs_free) cannot produce a q-leading output from a
    q-free one-hot operator, and every fix-up (identity-matmul transpose,
    VPU relayout, q-replicated operators) measured 90-100 ns/frame-iter —
    the whole-kernel step came out 108 ms vs the parent's 50 ms. In 2D
    both routes are single plain GEMMs with NO fix-up:

        down:  Wd [E, N]  (x)  post [N, q*TB]  -> [E, q*TB]
        up:    Wd^T contraction over E         -> [N, q*TB]

    fp-exact parity: every arithmetic association (butterfly order,
    leave-one-out product order, softmax division, tie-breaking scan)
    matches the parent kernel, so hard decisions/done/iters are identical
    (tested in tests/test_pallas.py).
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self.q > 32:
            raise ValueError(
                "frames-on-lanes layout needs q*TB lanes per row; q > 32 "
                "uses the checks-on-lanes ResidentQSPA with a small tile")
        q, dc, m, n = self.q, self.dc, self.m, self.n
        g = self.graph
        Mp = -(-m // 8) * 8          # sublane-pad each slot's row block
        self.m_pad = Mp
        E2 = dc * Mp
        self.e2 = E2
        cn_vn = g.cn_vn_np
        cn_mask = g.cn_mask_np
        # routing one-hot over edge-slot rows e = j*Mp + mi (pad rows zero)
        Wd = np.zeros((E2, n), np.float32)
        for mi in range(m):
            for j in range(dc):
                if cn_mask[mi, j]:
                    Wd[j * Mp + mi, cn_vn[mi, j]] = 1.0
        self.Wd = Wd
        # rotation bits per edge-slot row (pad rows 0 — their Ux rows are
        # overwritten by the delta fix / never routed up)
        L = q - 1
        lw = g.gf.log[np.maximum(g.cn_w_np, 1)]            # [M, dc]
        r_down = np.mod(lw, L)
        r_up = np.mod(L - lw, L)

        def bits2(r):
            out = np.zeros((self.rot_bits, E2, 1), np.float32)
            for t in range(self.rot_bits):
                for j in range(dc):
                    out[t, j * Mp:j * Mp + m, 0] = (r[:, j] >> t) & 1
            return out

        self.rbits_down2 = bits2(r_down)
        self.rbits_up2 = bits2(r_up)
        real = np.zeros((E2, 1), np.float32)
        for j in range(dc):
            real[j * Mp:j * Mp + m, 0] = cn_mask[:, j]
        self.real2 = real
        # STATIC rotation path (round 5, VERDICT item 6): when the rotation
        # amount is uniform over aligned 8-row chunks of the edge-slot rows
        # (QC codes: per-circulant weights with z % 8 == 0, or per-slot
        # weights at any z — codegen.make_qc_code), the rot_bits
        # conditional blend stages collapse to ONE static lane-group roll
        # per uniform chunk (8-row chunks are always sublane-tile-aligned).
        # Pad rows take their chunk's roll — their values are overwritten
        # by the delta fix (down) / never routed (up). fp-exact vs the
        # blend path: blends select with exact 0/1 products, so both
        # compute the identical permutation.
        # radix-4 rotation digits (rot_impl="b4"): one-hot masks per base-4
        # digit of the rotation amount — 2 blend stages instead of 4 for
        # q=16, halving the rotation's write passes (ROOFLINE.md item 2)
        self.rot_digits = (self.rot_bits + 1) // 2

        def digits4(r):
            out = np.zeros((self.rot_digits, 3, E2, 1), np.float32)
            for i in range(self.rot_digits):
                dig = (r >> (2 * i)) & 3
                for v in (1, 2, 3):
                    for j in range(dc):
                        out[i, v - 1, j * Mp:j * Mp + m, 0] = (
                            dig[:, j] == v)
            return out

        self.r4_down = digits4(r_down)
        self.r4_up = digits4(r_up)
        # irregular-code pad slots need the delta0 fix (spectrum = ones);
        # structural pad rows (mi >= m) are row-aligned garbage that the
        # up-route's zero rows ignore, so they alone don't require it
        self.has_pads2 = bool((real[:, 0] == 0).any()) and self.has_pads
        synk2 = np.zeros((dc, self.p, Mp), np.int32)
        synk2[:, :, :m] = self.syn_k_jpm
        self.synk2 = synk2
        # q >= 8 only: at GF(4) the rotation is 2 cheap blend stages and
        # the chunked static rolls measured 2x SLOWER (round5.json:
        # gf4_qspa_c8 2.0e8 vs gf4_qspa 4.0e8 sym/s) — the win scales
        # with rot_bits, the loss with chunk count.
        self.rot_static = None
        if q >= 8:
            self.rot_static = (self._rot_chunks(r_down, cn_mask),
                               self._rot_chunks(r_up, cn_mask))
            if self.rot_static[0] is None or self.rot_static[1] is None:
                self.rot_static = None

    def _rot_chunks(self, r, cn_mask):
        """Partition the E2 edge-slot rows into aligned chunks of uniform
        rotation amount, or None if any 8-row chunk mixes amounts (pad
        rows are don't-cares). Returns [(row0, row1, amount), ...]."""
        Mp, dc, m = self.m_pad, self.dc, self.m
        full = np.zeros((dc, Mp), np.int64)
        mask = np.zeros((dc, Mp), bool)
        for j in range(dc):
            full[j, :m] = r[:, j]
            mask[j, :m] = cn_mask[:, j]
        chunks = []
        for j in range(dc):
            for c in range(0, Mp, 8):
                rows = full[j, c:c + 8]
                real = mask[j, c:c + 8]
                vals = rows[real]
                if vals.size and not (vals == vals[0]).all():
                    return None
                amt = int(vals[0]) if vals.size else 0
                base = j * Mp + c
                if chunks and chunks[-1][1] == base and chunks[-1][2] == amt:
                    chunks[-1] = (chunks[-1][0], base + 8, amt)
                else:
                    chunks.append((base, base + 8, amt))
        return chunks

    # ---- kernel body (2D frames-on-lanes) -------------------------------

    def _kernel(self, llr_ref, wd_ref, rbd_ref, rbu_ref, real_ref, synk_ref,
                *rest):
        if self.rot_impl == "b4":
            r4d_ref, r4u_ref, hard_ref, stats_ref, lc_ref, post_ref = rest
        else:
            hard_ref, stats_ref, lc_ref, post_ref = rest
        q, n, m, dc, p = self.q, self.n, self.m, self.dc, self.p
        Mp, E2 = self.m_pad, self.e2
        TB = llr_ref.shape[2]
        n2e = [int(v) for v in self.nat_to_exp]
        e2n = [int(v) for v in self.exp_to_nat]
        L = q - 1
        mdt = self.mm_dtype

        def grp(X, a, w=1):
            """Lane-group slice: symbols [a, a+w) x all TB frames."""
            return X[:, a * TB:(a + w) * TB]

        def regroup(X, order):
            """Permute lane groups (the exp<->nat basis reorder)."""
            return jnp.concatenate([grp(X, k) for k in order], axis=1)

        # [N, q, TB] natural-order input -> 2D lane groups. NOTE: the
        # middle-index extract Lr[:, k, :] feeding a lane concat is the one
        # construct Mosaic rejects here ("result/input offset mismatch on
        # non-concat dimension") — reshape first, then group ops.
        Lr = llr_ref[...].reshape(n, q * TB)
        mx = Lr[:, :TB]
        for a in range(1, q):
            mx = jnp.maximum(mx, Lr[:, a * TB:(a + 1) * TB])
        Lrn = Lr - jnp.concatenate([mx] * q, axis=1)
        prior = jnp.concatenate(
            [Lrn[:, k * TB:(k + 1) * TB] for k in n2e],
            axis=1).astype(mdt)                            # [N, q*TB] exp

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
            """post [N, q*TB] -> edge-slot values [E2, q*TB]: one GEMM."""
            return dotg(Wd, post2, ((1,), (0,))).astype(mdt)

        def route_up():
            """lc_ref [E2, q*TB] -> posterior [N, q*TB] (incl. prior)."""
            r = dotg(Wd, lc_ref[...], ((0,), (0,)))
            return prior + r.astype(mdt)

        if self.rot_impl == "b4":
            R4d = r4d_ref[...]                         # [ndig, 3, E2, 1]
            R4u = r4u_ref[...]

        def rotate(X, RB):
            """Exp-order GF rotation of lane groups 1..q-1, per-row bits
            (binary conditional rolls), or per-row radix-4 digits: half the
            stages, 4-way one-hot blends — exact either way (every product
            has a 0.0/1.0 operand and the masks are one-hot). With
            per-slot-uniform weights (rot_static), ONE static lane-group
            roll per slot block replaces all blend stages."""
            if "rot" in self.ablate:
                return X
            if self.rot_static is not None:
                chunks = self.rot_static[0 if RB is RBd else 1]
                pieces = []
                for (r0, r1, amt) in chunks:
                    blk = X[r0:r1]
                    sstat = amt % L
                    if sstat == 0:
                        pieces.append(blk)
                        continue
                    Zb = blk[:, TB:]
                    cut = (L - sstat) * TB
                    pieces.append(jnp.concatenate(
                        [blk[:, :TB], Zb[:, cut:], Zb[:, :cut]], axis=1))
                return jnp.concatenate(pieces, axis=0)
            Z = X[:, TB:]
            one = jnp.asarray(1.0, X.dtype)
            if self.rot_impl == "b4":
                D = R4d if RB is RBd else R4u
                for i in range(self.rot_digits):
                    dv = [D[i, v - 1].astype(X.dtype) for v in (1, 2, 3)]
                    acc = Z * (one - dv[0] - dv[1] - dv[2])
                    for v in (1, 2, 3):
                        s = (v << (2 * i)) % L
                        if s == 0:
                            rolled = Z
                        else:
                            cut = (L - s) * TB
                            rolled = jnp.concatenate(
                                [Z[:, cut:], Z[:, :cut]], axis=1)
                        acc = acc + rolled * dv[v - 1]
                    Z = acc
                return jnp.concatenate([X[:, :TB], Z], axis=1)
            for t in range(self.rot_bits):
                s = (1 << t) % L
                cut = (L - s) * TB
                rolled = jnp.concatenate([Z[:, cut:], Z[:, :cut]], axis=1)
                b = RB[t].astype(X.dtype)
                Z = Z * (one - b) + rolled * b
            return jnp.concatenate([X[:, :TB], Z], axis=1)

        def wht_vpu(X):
            """Natural-order WHT across lane groups: p butterfly stages of
            aligned half-block add/sub + lane concat."""
            for i in range(p):
                h = 1 << i
                pieces = []
                for bb in range(0, q, 2 * h):
                    lo = grp(X, bb, h)
                    hi = grp(X, bb + h, h)
                    pieces.append(lo + hi)
                    pieces.append(lo - hi)
                X = jnp.concatenate(pieces, axis=1)
            return X

        def softmax_q(X, order=None):
            """exp + normalize across lane groups, f32 (prob domain).

            `order` permutes the OUTPUT lane groups inside the same concat
            that writes the division result — the exp<->nat basis regroup
            rides the softmax's materialization for free (per-element
            arithmetic identical, so results stay fp-exact)."""
            X = X.astype(jnp.float32)
            Ex = X if "trans" in self.ablate else jnp.exp(X)
            if "smax" in self.ablate:
                return Ex if order is None else regroup(Ex, order)
            S = grp(Ex, 0)
            for a in range(1, q):
                S = S + grp(Ex, a)
            out_order = range(q) if order is None else order
            return jnp.concatenate(
                [grp(Ex, k) / S for k in out_order], axis=1)

        def cn_update(Ux_nat):
            """[E2, q*TB] prob (NAT order in, exp order out) log extrinsic.
            Leave-one-out across the dc row blocks, in the parent kernel's
            exact association order."""
            if "wht" in self.ablate:
                F = Ux_nat
            else:
                F = wht_vpu(Ux_nat)
            def lou_concat(F):
                # concat-form leave-one-out (kept for the ablation probes
                # so "wht"/"lou" deltas keep their round-4 meaning)
                Fr = [F[j * Mp:(j + 1) * Mp] for j in range(dc)]
                if dc > 5:
                    suf = [None] * dc
                    run = jnp.ones_like(Fr[0])
                    for j in range(dc - 1, -1, -1):
                        suf[j] = run
                        run = run * Fr[j]
                runp = jnp.ones_like(Fr[0])
                Gr = []
                for j in range(dc):
                    if dc > 5:
                        sj = suf[j]
                    else:
                        sj = jnp.ones_like(Fr[0])
                        for k in range(dc - 1, j, -1):
                            sj = sj * Fr[k]
                    Gr.append(runp * sj)
                    runp = runp * Fr[j]
                return jnp.concatenate(Gr, axis=0)

            if "wht" in self.ablate:
                Q = F if "lou" in self.ablate else lou_concat(F)
                if "trans" in self.ablate:
                    return jnp.maximum(Q, PROB_FLOOR)
                return jnp.log(jnp.maximum(Q, PROB_FLOOR))
            if "lou" in self.ablate:
                W = wht_vpu(F)
                return jnp.concatenate(
                    [jnp.log(jnp.maximum(grp(W, k) * (1.0 / q), PROB_FLOOR))
                     for k in n2e], axis=1)
            # Leave-one-out products fused into the inverse-WHT stage-1
            # reads (round 5, VERDICT item 5 / ROOFLINE flagship path 3):
            # the WHT acts on lanes only, so it commutes with row-block
            # concatenation — run it per slot block with the product chain
            # runp*sj as the stage-1 operand expression, deleting the full
            # [E2, q*TB] G concat write. Per-element arithmetic and
            # association are unchanged -> fp-exact vs the concat form.
            Fr = [F[j * Mp:(j + 1) * Mp] for j in range(dc)]
            if dc > 5:
                suf = [None] * dc
                run = jnp.ones_like(Fr[0])
                for j in range(dc - 1, -1, -1):
                    suf[j] = run
                    run = run * Fr[j]
            runp = jnp.ones_like(Fr[0])
            pieces = []
            for j in range(dc):
                if dc > 5:
                    sj = suf[j]
                else:
                    # direct suffix recompute, same association as the
                    # list sweep (one fewer full tensor live in VMEM)
                    sj = jnp.ones_like(Fr[0])
                    for k in range(dc - 1, j, -1):
                        sj = sj * Fr[k]
                Wj = wht_vpu(runp * sj)
                runp = runp * Fr[j]
                if "trans" in self.ablate:
                    pieces.append(jnp.concatenate(
                        [jnp.maximum(grp(Wj, k) * (1.0 / q), PROB_FLOOR)
                         for k in n2e], axis=1))
                else:
                    pieces.append(jnp.concatenate(
                        [jnp.log(jnp.maximum(grp(Wj, k) * (1.0 / q),
                                             PROB_FLOOR))
                         for k in n2e], axis=1))
            return jnp.concatenate(pieces, axis=0)

        def hard_of(post2):
            """[N, q*TB] -> natural symbols [N, TB] f32; descending-symbol
            scan so fp ties resolve to the lowest natural symbol."""
            post2 = post2.astype(jnp.float32)
            mxp = grp(post2, 0)
            for a in range(1, q):
                mxp = jnp.maximum(mxp, grp(post2, a))
            order = sorted(range(q), key=lambda k: -n2e[k])
            idx = jnp.zeros_like(mxp)
            for k in order:
                idx = jnp.where(grp(post2, k) >= mxp,
                                jnp.float32(n2e[k]), idx)
            return idx

        def syndrome_ok(hardf):
            """[N, TB] f32 -> done [1, TB] f32 (1 = all checks satisfied)."""
            acc = jnp.zeros((Mp, TB), jnp.int32)
            for j in range(dc):
                he = dotg(Wd[j * Mp:(j + 1) * Mp], hardf, ((1,), (0,)),
                          adt=jnp.float32).astype(jnp.int32)
                gx = jnp.zeros_like(he)
                for t in range(p):
                    gx = gx ^ (((he >> t) & 1) * synk[j, t][:, None])
                acc = acc ^ gx
            bad = jnp.max(acc, axis=0, keepdims=True)      # [1, TB]
            return jnp.where(bad == 0, 1.0, 0.0)

        # ---- init ----
        lc_ref[...] = jnp.zeros((E2, q * TB), mdt)
        hard0 = hard_of(prior)
        done0 = syndrome_ok(hard0)
        iters0 = jnp.zeros((1, TB), jnp.float32)
        if self.has_pads2:
            d0 = jnp.concatenate(
                [jnp.ones((1, TB), jnp.float32),
                 jnp.zeros((1, (q - 1) * TB), jnp.float32)], axis=1)

        post_ref[...] = prior

        def body(carry):
            # post lives in the post_ref scratch (like lC): the loop carry
            # holds only the small per-frame stats, so the fori_loop moves
            # no full-tensor state between iterations
            hardf, done, iters = carry
            if "route" in self.ablate:
                Ve = lc_ref[...] * jnp.asarray(1.0, mdt)
            else:
                Ve = route_down(post_ref[...]) - lc_ref[...]
            # softmax emits in NAT order (exp->nat regroup folded into its
            # output concat); cn_update returns exp order (regroup folded
            # into its final log concat)
            Ux = softmax_q(rotate(Ve, RBd), order=e2n)
            if self.has_pads2:
                # nat-order group 0 is symbol 0 — same delta pattern
                Ux = Ux * real + d0 * (1.0 - real)
            lc_ref[...] = rotate(cn_update(Ux).astype(mdt), RBu)
            if "route" in self.ablate:
                s = jnp.sum(lc_ref[...], axis=0).reshape(1, q * TB)
                post_ref[...] = prior + (
                    s * jnp.asarray(1e-9, mdt)).astype(mdt)
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
            # (a 2x loop unroll was measured neutral here — Mosaic already
            # schedules across the fori_loop boundary)
            carry = jax.lax.fori_loop(0, self.max_iters,
                                      lambda i, c: body(c), carry)

        hardf, done, iters = carry
        if not self.stats_each_iter:
            hardf = hard_of(post_ref[...])
            done = syndrome_ok(hardf)
        hard_ref[...] = hardf.astype(jnp.int32)            # [N, TB]
        stats_ref[...] = jnp.concatenate(
            [done, iters, jnp.zeros((6, TB), jnp.float32)], axis=0)

    # ---- public entry ----------------------------------------------------

    def __call__(self, llr: jnp.ndarray, tb: int = 128,
                 interpret: bool = False):
        """llr [B, N, q] -> (hard [B, N] i32, done [B] bool, iters [B] i32).

        tb is the frame tile inside each lane group: use a multiple of 128
        (any divisor of B works but sub-128 tiles pad lanes and waste VPU
        work, which is what this layout exists to avoid).
        """
        B = llr.shape[0]
        q, n = self.q, self.n
        tb = min(tb, B)
        assert B % tb == 0, f"batch {B} must be a multiple of tile {tb}"
        lt = jnp.transpose(llr, (1, 2, 0))                 # [N, q, B]

        grid = (B // tb,)
        consts = [
            jnp.asarray(self.Wd),
            jnp.asarray(self.rbits_down2),
            jnp.asarray(self.rbits_up2),
            jnp.asarray(self.real2),
            jnp.asarray(self.synk2),
        ]
        if getattr(self, "rot_impl", "b2") == "b4":
            consts += [jnp.asarray(self.r4_down), jnp.asarray(self.r4_up)]
        const_specs = [
            pl.BlockSpec(c.shape, lambda i, _nd=c.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM)
            for c in consts
        ]
        hard, stats = pl.pallas_call(
            self._kernel,
            out_shape=(
                jax.ShapeDtypeStruct((n, B), jnp.int32),
                jax.ShapeDtypeStruct((8, B), jnp.float32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((n, q, tb), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                *const_specs,
            ],
            out_specs=(
                pl.BlockSpec((n, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((self.e2, q * tb), self.mm_dtype),
                pltpu.VMEM((n, q * tb), self.mm_dtype),
            ],
            # the default scoped-vmem limit is 16M; the full-tensor peak
            # (lC scratch + spectra + posterior + double-buffered input)
            # needs more at TB=128 — the chip's physical VMEM is larger
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(lt, *consts)
        done = stats[0] > 0.5
        iters = stats[1].astype(jnp.int32)
        return jnp.transpose(hard), done, iters


def get_resident_decoder(graph: TannerGraph, max_iters: int, early_term: bool,
                         stats_each_iter: bool = True,
                         mm_dtype=jnp.float32, wht_impl: str = "vpu",
                         layout: str = "fl"):
    """Build (and cache on the graph) a ResidentQSPA for this config.

    stats_each_iter=True (default) keeps fixed-budget semantics identical to
    the XLA path (hard decisions frozen at first convergence, per-frame iters
    counted). Pass False explicitly for pure throughput benchmarking — iters
    then reports max_iters (BASELINE.json fixed-50-iter throughput mode).
    """
    key = ("resident", max_iters, early_term, stats_each_iter,
           jnp.dtype(mm_dtype).name, wht_impl, layout)
    cache = getattr(graph, "_resident_cache", None)
    if cache is None:
        cache = {}
        graph._resident_cache = cache
    cls = ResidentQSPAFL if layout == "fl" else ResidentQSPA
    if key not in cache:
        cache[key] = cls(graph, max_iters, early_term,
                         stats_each_iter=stats_each_iter,
                         mm_dtype=mm_dtype, wht_impl=wht_impl)
    return cache[key]
