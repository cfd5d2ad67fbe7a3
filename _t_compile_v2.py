import importlib.util, time, traceback
import jax, jax.numpy as jnp
from nbldpc_tpu.codegen import make_peg_code
from nbldpc_tpu.graph import TannerGraph

spec_mod = importlib.util.spec_from_file_location("qr_v2", "/tmp/v2check/qspa_resident_v2.py")
qr_v2 = importlib.util.module_from_spec(spec_mod)
spec_mod.loader.exec_module(qr_v2)

spec = make_peg_code(16, 8, 16, dv=2, seed=7)
g = TannerGraph(spec)
dec = qr_v2.ResidentQSPA(g, max_iters=2, early_term=False, stats_each_iter=False)
llr = jax.random.normal(jax.random.PRNGKey(0), (8, spec.n, spec.q), jnp.float32)
t0 = time.perf_counter()
try:
    out = jax.jit(lambda x: dec(x, tb=8))(llr)
    jax.block_until_ready(out)
    print("V2 OK compile+run", round(time.perf_counter() - t0, 1), "s")
except Exception:
    traceback.print_exc()
