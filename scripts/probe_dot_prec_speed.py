"""Time an in-kernel batched dot chain at each precision setting.

Answers two round-4 questions:
  1. does Mosaic's f32 dot rate depend on `precision` at all on this chip?
  2. what is the per-shape ceiling for the bench's (B=8, Np=104) batched
     dots, i.e. how much of the fused kernel is MXU vs everything else?
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, CHAIN, GRID = 8, 104, 64, 64


def kernel(prec, x_ref, y_ref, o_ref):
    acc = y_ref[0]
    for _ in range(CHAIN):
        acc = jax.lax.dot_general(
            x_ref[0], acc, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
    o_ref[0] = acc


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((GRID, B, N, N)).astype(np.float32)) * 0.01
    y = jnp.asarray(rng.standard_normal((GRID, B, N, N)).astype(np.float32))

    for prec in ("highest", "high", None, "float32"):
        try:
            fn = pl.pallas_call(
                functools.partial(kernel, prec),
                grid=(GRID,),
                in_specs=[pl.BlockSpec((1, B, N, N), lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec((1, B, N, N), lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((GRID, B, N, N), jnp.float32),
            )
            jfn = jax.jit(fn)
            out = jfn(x, y)
            _ = np.asarray(out)          # value-fetch sync (axon tunnel)
            t0 = time.perf_counter()
            reps = 200
            for _ in range(reps):
                out = jfn(x, out)        # serial dependency across reps
            _ = np.asarray(out)
            dt = (time.perf_counter() - t0) / reps
            fl = 2.0 * GRID * B * CHAIN * N**3
            print(f"precision={str(prec):8s}: {dt*1e3:7.2f} ms  "
                  f"{fl/dt/1e12:6.2f} TF/s", flush=True)
        except Exception as e:
            print(f"precision={str(prec):8s} FAIL {str(e)[:150]}")


if __name__ == "__main__":
    main()
