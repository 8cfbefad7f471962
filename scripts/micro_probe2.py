"""Characterize the axon/TPU execution model: fixed per-op overhead vs
bandwidth/compute scaling, scan vs unrolled, and the nSpec=1024 fault."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(f, *args, reps=3):
    r = f(*args)
    jax.tree.map(lambda x: x.block_until_ready(), r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        jax.tree.map(lambda x: x.block_until_ready(), r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def gemm_chain(batch, N, length, unroll=False):
    key = jax.random.PRNGKey(0)
    A = 0.01 * jax.random.normal(key, (batch, N, N), jnp.float32) \
        + jnp.eye(N)[None]
    x0 = jnp.broadcast_to(jnp.eye(N, dtype=jnp.float32), (batch, N, N))

    if unroll:
        def chain(x):
            for _ in range(length):
                x = jnp.matmul(x, A, precision="highest") * 0.999
            return x
    else:
        def chain(x):
            def step(c, _):
                return jnp.matmul(c, A, precision="highest") * 0.999, None
            out, _ = lax.scan(step, x, None, length=length)
            return out
    t = timeit(jax.jit(chain), x0)
    per = t / length
    fl = 2 * batch * N ** 3
    print(f"batch={batch:6d} N={N} len={length:4d} "
          f"{'unroll' if unroll else 'scan  '} t={t*1e3:9.2f} ms  "
          f"{per*1e6:8.1f} us/iter  {fl/per/1e12:7.3f} TF/s", flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    # fixed-overhead vs bandwidth: batch sweep at constant length
    for batch in (256, 1024, 4096, 16384):
        gemm_chain(batch, 52, 100)
    # scan-length sweep
    for length in (10, 1000):
        gemm_chain(1024, 52, length)
    # unrolled
    gemm_chain(1024, 52, 100, unroll=True)
    # bigger matrices (MXU-friendly 128)
    gemm_chain(1024, 128, 100)


if __name__ == "__main__":
    main()
