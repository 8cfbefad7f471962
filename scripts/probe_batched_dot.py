"""Find the fastest TPU formulation of the batched small matmul.

All operands passed as explicit jit arguments (captured multi-MB device
constants hang the axon remote compiler), loops as bounded Python unrolls.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, NREP = 2048, 40


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def report(name, dt, N, s=S):
    fl = NREP * 2 * N**3 * s
    print(f"{name:42s}: {dt*1e3:8.2f} ms  {fl/dt/1e12:6.2f} TF/s", flush=True)


@jax.jit
def noop(x):
    return x * 1.0000001


def xla_batched(precision):
    def f(x, a):
        for _ in range(NREP):
            x = jax.lax.dot_general(x, a, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32,
                                    precision=precision)
            x = x * 1.0000001
        return x
    return jax.jit(f)


def pallas_batched(N, block, precision):
    def kernel(x_ref, a_ref, o_ref):
        aa = a_ref[:]
        x = x_ref[:]
        for _ in range(NREP):
            x = jax.lax.dot_general(
                x, aa, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision)
            x = x * 1.0000001
        o_ref[:] = x

    spec = pl.BlockSpec((block, N, N), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel, grid=(S // block,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((S, N, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024))
    return jax.jit(fn)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    # Measure the dispatch/sync floor first.
    z = jnp.ones((8, 128))
    print(f"dispatch+sync floor: {timeit(noop, z)*1e3:.2f} ms", flush=True)
    for N in (52, 104):
        a = jnp.asarray(rng.random((S, N, N)) / N, jnp.float32)
        report(f"XLA batched N={N} highest",
               timeit(xla_batched("highest"), a, a), N)
        report(f"XLA batched N={N} default",
               timeit(xla_batched("default"), a, a), N)
        for block, prec in ((16, "highest"), (64, "highest"),
                            (64, "default")):
            try:
                report(f"Pallas batched N={N} b={block} {prec}",
                       timeit(pallas_batched(N, block, prec), a, a), N)
            except Exception as e:
                print(f"Pallas N={N} b={block}: FAIL {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
