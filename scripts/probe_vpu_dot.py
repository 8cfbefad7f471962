"""VPU lane-batched small-matmul probe: spectral axis on lanes.

Layout (N, N, s): C[i,j,s] = sum_k A[i,k,s] * B[k,j,s] computed as N
elementwise FMAs over (N, N, s_block) VMEM arrays — pure VPU work, true
f32 (no MXU pass multiplication), batch fully vectorized on lanes.
This is the layout the reference uses for CUBLAS batched GEMM
((N, N, nSpec), gpu_batched_cuda.jl:208-233) — on TPU it maps to the VPU.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, NREP = 2048, 100


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


def vpu_batched(a, block, inner=10):
    """a: (N, N, S) lane-batched."""
    N = a.shape[0]
    outer = NREP // inner

    def kernel(x_ref, a_ref, o_ref):
        aa = a_ref[:]

        def matmul(x):
            # C[i,j,s] = sum_k x[i,k,s] aa[k,j,s]
            acc = jnp.zeros_like(x)
            for k in range(N):
                acc = acc + x[:, k:k + 1, :] * aa[k:k + 1, :, :]
            return acc

        def body(_, x):
            for _ in range(inner):
                x = matmul(x) * 1.0000001
            return x
        o_ref[:] = jax.lax.fori_loop(0, outer, body, x_ref[:])

    spec = pl.BlockSpec((N, N, block), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel, grid=(S // block,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024))
    return jax.jit(lambda x: fn(x, a))


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    for N in (52,):
        a = jnp.asarray(rng.random((N, N, S)) / N, jnp.float32)
        for block in (128, 256, 512):
            try:
                dt = timeit(vpu_batched(a, block), a)
                fl = NREP * 2 * N**3 * S
                print(f"VPU lane-batched N={N} b={block}: {dt*1e3:8.2f} ms "
                      f"{fl/dt/1e12:6.2f} TF/s", flush=True)
            except Exception as e:
                print(f"VPU N={N} b={block}: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
