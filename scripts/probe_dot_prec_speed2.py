"""Throughput ceiling for in-kernel batched dots, per precision, with
independent dots (ILP) rather than a serial chain — the shape class of the
fused band kernel's ladder ((B, Np, Np) @ (B, Np, C) with C up to 3 Np)."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, GRID = 8, 104, 64
NDOT = 16     # independent dot pairs per program


def kernel(prec, x_ref, y_ref, o_ref):
    acc = jnp.zeros_like(y_ref[0])
    for k in range(NDOT):
        # vary operands so nothing folds; all NDOT dots are independent
        acc = acc + jax.lax.dot_general(
            x_ref[0] + np.float32(k), y_ref[0], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
    o_ref[0] = acc


def main():
    rng = np.random.default_rng(0)
    for C in (N, 3 * N):
        x = jnp.asarray(rng.standard_normal((GRID, B, N, N)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((GRID, B, N, C)).astype(np.float32))
        for prec in ("highest", None):
            fn = pl.pallas_call(
                functools.partial(kernel, prec),
                grid=(GRID,),
                in_specs=[
                    pl.BlockSpec((1, B, N, N), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, B, N, C), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, B, N, C), lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((GRID, B, N, C), jnp.float32),
            )
            jfn = jax.jit(fn)
            out = jfn(x, y)
            _ = np.asarray(out)
            t0 = time.perf_counter()
            reps = 100
            for _ in range(reps):
                out = jfn(x, out)
            _ = np.asarray(out)
            dt = (time.perf_counter() - t0) / reps
            fl = 2.0 * GRID * B * NDOT * N * N * C
            print(f"C={C:4d} precision={str(prec):8s}: {dt*1e3:7.2f} ms  "
                  f"{fl/dt/1e12:6.2f} TF/s", flush=True)


if __name__ == "__main__":
    main()
