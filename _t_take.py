import traceback
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

q = 64
idx = np.arange(q) ^ 5

def kern(x_ref, o_ref):
    X = x_ref[...]          # [4, q, 128]
    o_ref[...] = jnp.take(X, jnp.asarray(idx), axis=1)

X = jnp.arange(4 * q * 128, dtype=jnp.float32).reshape(4, q, 128)
try:
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((4, q, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(X)
    jax.block_until_ready(out)
    ref = np.take(np.asarray(X), idx, axis=1)
    print("STATIC TAKE OK", bool((np.asarray(out) == ref).all()))
except Exception:
    traceback.print_exc()
