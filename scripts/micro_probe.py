"""Micro-benchmark: where do the TPU cycles go? Batched GEMM vs LU vs
triangular solve vs full rt-style chain at solver shapes."""
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


def main():
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 52
    print(f"device: {jax.devices()[0].device_kind}, batch={s}, N={N}",
          flush=True)
    key = jax.random.PRNGKey(0)
    a = 0.1 * jax.random.normal(key, (s, N, N), jnp.float32)
    A = jnp.eye(N)[None] - jnp.matmul(a, a)
    b = jnp.broadcast_to(jnp.eye(N, dtype=jnp.float32), (s, N, N))

    # 1. one batched GEMM
    gemm = jax.jit(lambda x, y: jnp.matmul(x, y, precision="highest"))
    t = timeit(gemm, A, b)
    print(f"GEMM x1:      {t*1e3:9.3f} ms  {2*s*N**3/t/1e12:8.3f} TF/s",
          flush=True)

    # 2. chain of 100 GEMMs under one jit (scan) — dispatch-free throughput
    def chain(x):
        def step(c, _):
            return jnp.matmul(c, A, precision="highest") * 0.999, None
        out, _ = lax.scan(step, x, None, length=100)
        return out
    t = timeit(jax.jit(chain), b)
    print(f"GEMM x100:    {t*1e3:9.3f} ms  {200*s*N**3/t/1e12:8.3f} TF/s",
          flush=True)

    # 3. batched LU
    lu_fn = jax.jit(lambda x: lax.linalg.lu(x)[0])
    t = timeit(lu_fn, A)
    print(f"LU x1:        {t*1e3:9.3f} ms", flush=True)

    # 4. batched solve (LU + triangular solves)
    solve_fn = jax.jit(lambda x, y: jnp.linalg.solve(x, y))
    t = timeit(solve_fn, A, b)
    print(f"solve x1:     {t*1e3:9.3f} ms", flush=True)

    # 5. scan of 10 solves
    def chain_solve(x):
        def step(c, _):
            return jnp.linalg.solve(A, c), None
        out, _ = lax.scan(step, x, None, length=10)
        return out
    t = timeit(jax.jit(chain_solve), b)
    print(f"solve x10:    {t*1e3:9.3f} ms ({t*1e2:9.3f} ms/solve)",
          flush=True)

    # 6. triangular solve alone
    tri = jax.jit(lambda l, y: lax.linalg.triangular_solve(
        l, y, left_side=True, lower=True, unit_diagonal=True))
    t = timeit(tri, A, b)
    print(f"tri-solve x1: {t*1e3:9.3f} ms", flush=True)

    # 7. Newton-Schulz inverse of (I - a a), 6 iters (GEMM-only)
    def ns_inv(aa):
        A_ = jnp.eye(N)[None] - aa
        X = jnp.eye(N)[None] + aa          # 2-term Neumann init
        for _ in range(6):
            X = jnp.matmul(X, 2.0 * jnp.eye(N)[None]
                           - jnp.matmul(A_, X, precision="highest"),
                           precision="highest")
        return X
    aa = jnp.matmul(a, a)
    t = timeit(jax.jit(ns_inv), aa)
    err_fn = jax.jit(lambda aa: jnp.abs(
        jnp.matmul(jnp.eye(N)[None] - aa, ns_inv(aa)) - jnp.eye(N)[None]).max())
    print(f"NS-inv(6it):  {t*1e3:9.3f} ms   max|AX - I| = "
          f"{float(err_fn(aa)):.2e}", flush=True)


if __name__ == "__main__":
    main()
