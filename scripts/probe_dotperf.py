"""Micro-probe: achievable per-point small-matmul throughput inside one
Pallas kernel, per precision and per formulation (MXU dot vs VPU
lanes-batch). Determines the compute ceiling for the fused RT kernels.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 52
CHAIN = 64          # dots per kernel invocation per block
_I0 = np.int32(0)

CP = pltpu.CompilerParams(dimension_semantics=("parallel",),
                          vmem_limit_bytes=100 * 1024 * 1024)


def sync(x):
    return float(jnp.sum(x))


def bench(fn, args, reps=5):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def mxu_kernel(a_ref, o_ref, *, precision):
    a = a_ref[:]
    x = a
    for _ in range(CHAIN):
        x = jax.lax.dot_general(x, a, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                                precision=precision)
        x = x * 0.25   # keep magnitudes bounded
    o_ref[:] = x


def run_mxu(s, block, precision):
    a = jnp.asarray(np.random.default_rng(0).random((s, N, N)) / N,
                    jnp.float32)
    spec = pl.BlockSpec((block, N, N), lambda i: (i, _I0, _I0),
                        memory_space=pltpu.VMEM)
    fn = jax.jit(pl.pallas_call(
        partial(mxu_kernel, precision=precision),
        grid=(s // block,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        compiler_params=CP))
    dt = bench(fn, (a,))
    fl = 2.0 * N ** 3 * CHAIN * s
    return dt, fl / dt / 1e12


def vpu_kernel(a_ref, o_ref):
    # layout (N_i, N_j, B): batch in lanes; matmul as j-sum of rank-1 VPU FMAs
    a = a_ref[:]
    x = a
    for _ in range(CHAIN):
        acc = jnp.zeros_like(x)
        for j in range(N):
            acc = acc + x[:, j:j + 1, :] * a[j:j + 1, :, :]
        x = acc * 0.25
    o_ref[:] = x


def run_vpu(s, block):
    a = jnp.asarray(np.random.default_rng(0).random((N, N, s)) / N,
                    jnp.float32)
    spec = pl.BlockSpec((N, N, block), lambda i: (_I0, _I0, i),
                        memory_space=pltpu.VMEM)
    fn = jax.jit(pl.pallas_call(
        vpu_kernel,
        grid=(s // block,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        compiler_params=CP))
    dt = bench(fn, (a,))
    fl = 2.0 * N ** 3 * CHAIN * s
    return dt, fl / dt / 1e12


def main():
    print("device:", jax.devices()[0].device_kind)
    s = 2048
    for prec in ("default", "high", "highest"):
        try:
            dt, tf = run_mxu(s, 128, prec)
            print(f"MXU dot {prec:8s}: {dt*1e3:8.2f} ms  {tf:6.2f} TF/s useful")
        except Exception as e:
            print(f"MXU dot {prec:8s}: FAIL {str(e)[:120]}")
    for block in (128, 256):
        try:
            dt, tf = run_vpu(s, block)
            print(f"VPU lanes  B={block:4d}: {dt*1e3:8.2f} ms  {tf:6.2f} TF/s useful")
        except Exception as e:
            print(f"VPU lanes  B={block:4d}: FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
