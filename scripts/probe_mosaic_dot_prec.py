"""Does Mosaic honor dot_general precision inside Pallas on this TPU?

Compares an in-kernel dot at several precision settings against an f64
numpy reference; XLA's own f32 dot (precision=highest) is the yardstick.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N = 8, 104


def kernel(prec, x_ref, y_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[...], y_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)


def main():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, N, N)).astype(np.float32)
    y = rng.standard_normal((B, N, N)).astype(np.float32)
    ref = np.einsum("bij,bjk->bik", x.astype(np.float64), y.astype(np.float64))
    scale = np.abs(ref).max()

    xj, yj = jnp.asarray(x), jnp.asarray(y)
    xla = np.asarray(jnp.matmul(xj, yj, precision="highest"))
    print(f"XLA highest   rel err: {np.abs(xla-ref).max()/scale:.3e}")

    for prec in ("highest", "float32", None):
        try:
            fn = pl.pallas_call(
                functools.partial(kernel, prec),
                in_specs=[pl.BlockSpec((B, N, N), lambda: (0, 0, 0),
                                       memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec((B, N, N), lambda: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
            )
            out = np.asarray(fn(xj, yj))
            print(f"Pallas {str(prec):10s} rel err: "
                  f"{np.abs(out-ref).max()/scale:.3e}")
        except Exception as e:
            print(f"Pallas {str(prec):10s} FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
