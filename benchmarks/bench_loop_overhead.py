"""Measure fori_loop per-iteration floor cost with large carried state."""
import json, os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nbldpc_jax_cache")
import jax
import jax.numpy as jnp

K = 50


def timed(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    dt = (time.perf_counter() - t0) / K
    print(json.dumps({"case": name, "ms_per_iter": round(dt * 1e3, 3)}))


def main():
    B = 4096
    x = jnp.ones((204, 2, 16, B), jnp.float32)   # 107 MB, like Cv

    timed("add_const", lambda v: jax.lax.fori_loop(0, K, lambda i, a: a + 1.0, v), x)
    timed("two_pass", lambda v: jax.lax.fori_loop(
        0, K, lambda i, a: (a - jnp.max(a, axis=2, keepdims=True)) + 1.0, v), x)
    timed("exp_log", lambda v: jax.lax.fori_loop(
        0, K, lambda i, a: jnp.log(jnp.exp(a * 0.99) + 1e-30), v), x)
    # row gather of the same footprint
    idx = jnp.arange(204 * 2 * 16, dtype=jnp.int32)[::-1]
    def gath(v):
        def body(i, a):
            flat = a.reshape(-1, B)
            out = jnp.take(flat, idx, axis=0, mode="clip")
            return out.reshape(a.shape)
        return jax.lax.fori_loop(0, K, body, v)
    timed("row_gather", gath, x)


if __name__ == "__main__":
    main()
