import time, traceback
import jax, jax.numpy as jnp
from nbldpc_tpu.codegen import make_peg_code
from nbldpc_tpu.graph import TannerGraph
from nbldpc_tpu.kernels.qspa_resident import ResidentQSPA

spec = make_peg_code(16, 8, 16, dv=2, seed=7)
g = TannerGraph(spec)
dec = ResidentQSPA(g, max_iters=2, early_term=False, stats_each_iter=False)
llr = jax.random.normal(jax.random.PRNGKey(0), (8, spec.n, spec.q), jnp.float32)
t0 = time.perf_counter()
try:
    out = jax.jit(lambda x: dec(x, tb=8))(llr)
    jax.block_until_ready(out)
    print("OK compile+run", round(time.perf_counter() - t0, 1), "s")
except Exception:
    traceback.print_exc()
