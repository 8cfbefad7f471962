"""Batched small-matrix linear algebra for the RT solver.

TPU-native replacement for the reference's batch_inv!/batch_solve! layer
(/root/reference/ext/gpu_batched_cuda.jl:97-182 CUBLAS batched LU;
tools/ka_batched_kernels.jl:118-196 portable LU) — the hottest non-GEMM op
in the solver: one ``(I - R R)^{-1} X`` per doubling step and two per
interaction, batched over the spectral axis.

Backend policy:
* float32 (or any dtype XLA's LU supports on the current backend):
  ``jnp.linalg.solve`` — native batched LU.
* float64 on TPU: XLA's TPU LuDecomposition only implements F32/C64, so we
  factor in f32 on the MXU and recover full f64 accuracy with mixed-precision
  iterative refinement (Wilkinson; the standard HPL-AI trick). The systems
  here are diagonally-dominant-by-construction ``I - R R`` with spectral
  radius(R R) < 1 (energy conservation), so a fixed small iteration count
  converges to f64 roundoff.
"""

import jax
import jax.numpy as jnp
from jax import lax

REFINEMENT_ITERS = 4


def _lu_solve_f32(lu, perm, b32):
    """Solve with a precomputed batched f32 LU factorization."""
    bp = jnp.take_along_axis(b32, perm[..., None], axis=-2)
    y = lax.linalg.triangular_solve(lu, bp, left_side=True, lower=True,
                                    unit_diagonal=True)
    return lax.linalg.triangular_solve(lu, y, left_side=True, lower=False)


def refined_solve(a, b, iters: int = REFINEMENT_ITERS):
    """Solve a @ x = b in f64 using an f32 LU + iterative refinement.

    a: (..., n, n) float64, b: (..., n, k) float64.
    """
    a32 = a.astype(jnp.float32)
    lu, _, perm = lax.linalg.lu(a32)
    x = _lu_solve_f32(lu, perm, b.astype(jnp.float32)).astype(jnp.float64)

    def body(_, x):
        r = b - jnp.matmul(a, x, precision="highest")
        dx = _lu_solve_f32(lu, perm, r.astype(jnp.float32))
        return x + dx.astype(jnp.float64)

    return lax.fori_loop(0, iters, body, x)


def batch_solve(a, b):
    """Batched solve a @ x = b, choosing the fastest correct path for the
    current backend/dtype."""
    if a.dtype == jnp.float64 and jax.default_backend() not in ("cpu",):
        return refined_solve(a, b)
    return jnp.linalg.solve(a, b)
