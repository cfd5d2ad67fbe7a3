import traceback
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(a_ref, x_ref, o_ref):
    A = a_ref[...]          # [64, 64]
    X = x_ref[...]          # [64, 8, 128]
    o_ref[...] = jax.lax.dot_general(A, X, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

A = jnp.ones((64, 64), jnp.float32)
X = jnp.ones((64, 8, 128), jnp.float32)
try:
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((64, 8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(A, X)
    jax.block_until_ready(out)
    print("RANK3 DOT OK", float(out[0,0,0]))
except Exception:
    traceback.print_exc()
