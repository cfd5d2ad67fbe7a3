"""High-q (q > 32) decoder throughput: chained-slope timing (round 5).

Measures decode-only steps for the GF(64)/GF(256) BASELINE codes across
implementations (new large-q resident cl kernel vs the per-iteration K1
Pallas pipeline vs pure XLA), using the round-4 chained+fetch SLOPE
methodology (see bench.py: the axon tunnel elides unfetched programs and
charges ~11 ms per host fetch; only slopes between chain depths are honest).

    python benchmarks/bench_highq.py --code gf256_n255_k175 \
        --decoder qspa --impl resident --batch 512 --iters 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="gf256_n255_k175")
    ap.add_argument("--decoder", default="qspa", help="qspa | ems | tems")
    ap.add_argument("--impl", default="resident",
                    help="qspa: resident | pallas | xla; ems/tems: "
                         "kernel (pallas CN) | xla | list (bubble EMS)")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--nm", type=int, default=16)
    ap.add_argument("--nr", type=int, default=0,
                    help="tems: truncated deviation rows (0 = exact scan)")
    ap.add_argument("--chain", default="2,6",
                    help="lo,hi chain depths for the slope")
    args = ap.parse_args()

    from nbldpc_tpu.code import load_alist
    from nbldpc_tpu.graph import TannerGraph

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "codes", args.code + ".alist")
    spec = load_alist(path)
    graph = TannerGraph(spec)
    B, q, n = args.batch, spec.q, spec.n
    key = jax.random.PRNGKey(0)
    llr = jax.random.normal(key, (B, n, q), jnp.float32) * 4.0

    if args.decoder == "qspa":
        from nbldpc_tpu.decoders import qspa

        fn = jax.jit(lambda x: qspa.decode(
            graph, x, max_iters=args.iters, early_term=False,
            cn_impl=args.impl, stats_each_iter=False).hard)
    elif args.decoder == "ems":
        from nbldpc_tpu.decoders import ems

        if args.impl in ("list", "listx"):
            # "list" = bubble merge, kernel-or-XLA per platform (auto);
            # "listx" = bubble merge forced onto the XLA path
            up = "no" if args.impl == "listx" else "auto"
            fn = jax.jit(lambda x: ems.decode(
                graph, x, max_iters=args.iters, nm=args.nm,
                early_term=False, merge="bubble", use_pallas=up,
                stats_each_iter=False).hard)
        else:
            use_pallas = {"kernel": "yes", "xla": "no"}.get(args.impl,
                                                            args.impl)
            fn = jax.jit(lambda x: ems.decode(
                graph, x, max_iters=args.iters, nm=args.nm,
                early_term=False, use_pallas=use_pallas,
                stats_each_iter=False).hard)
    else:
        from nbldpc_tpu.decoders import tems

        use_pallas = {"kernel": "yes", "xla": "no"}.get(args.impl, args.impl)
        kw = dict(n_r=args.nr) if args.nr else {}
        fn = jax.jit(lambda x: tems.decode(
            graph, x, max_iters=args.iters, early_term=False,
            use_pallas=use_pallas, stats_each_iter=False, **kw).hard)

    t0 = time.perf_counter()
    jax.block_until_ready(fn(llr))
    compile_s = time.perf_counter() - t0

    def chain(depth):
        acc = jnp.zeros((), jnp.float32)
        for r in range(depth):
            hard = fn(llr + acc * 1e-30)
            acc = acc + jnp.sum(hard).astype(jnp.float32) * 1e-20
        return acc

    lo, hi = (int(x) for x in args.chain.split(","))
    float(chain(lo))                          # warm both chain programs
    float(chain(hi))
    t0 = time.perf_counter()
    float(chain(lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(hi))
    t_hi = time.perf_counter() - t0
    dt = (t_hi - t_lo) / (hi - lo)

    print(json.dumps({
        "variant": f"{args.code}_{args.decoder}_{args.impl}"
                   + (f"_nm{args.nm}" if args.decoder == "ems" else "")
                   + (f"_nr{args.nr}" if args.nr else ""),
        "batch": B, "iters": args.iters,
        "sym_per_s": round(B * n / dt, 1),
        "step_ms": round(dt * 1e3, 2),
        "ms_per_iter": round(dt * 1e3 / args.iters, 3),
        "compile_s": round(compile_s, 1),
        "platform": jax.devices()[0].platform,
    }), flush=True)


if __name__ == "__main__":
    main()
