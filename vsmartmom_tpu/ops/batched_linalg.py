"""Batched small-matrix linear algebra for the RT solver.

TPU-native replacement for the reference's batch_inv!/batch_solve! layer
(/root/reference/ext/gpu_batched_cuda.jl:97-182 CUBLAS batched LU;
tools/ka_batched_kernels.jl:118-196 portable LU) — the hottest non-GEMM op
in the solver: one ``(I - R R)^{-1} X`` per doubling step and two per
interaction, batched over the spectral axis.

Backend policy:
* CPU: ``jnp.linalg.solve`` (LAPACK batched LU, full precision).
* TPU: XLA's LuDecomposition only implements F32/C64 *and* runs its internal
  dot_generals at default (bf16-pass) MXU precision, which costs ~1e-3
  relative error — visible at the 1% level after 20+ Fourier moments of
  accumulation. We therefore always wrap the factorization in
  mixed-precision iterative refinement (Wilkinson): LU once, then
  ``x += LU_solve(b - A x)`` with the residual computed at
  ``precision="highest"`` in the working dtype. The systems here are
  diagonally-dominant-by-construction ``I - R R`` with spectral
  radius(R R) < 1 (energy conservation), so a fixed small iteration count
  converges to working-dtype roundoff (f32: 2 iters; f64: 4 iters).
"""

import jax
import jax.numpy as jnp
from jax import lax


def _lu_solve_f32(lu, perm, b32):
    """Solve with a precomputed batched f32 LU factorization."""
    bp = jnp.take_along_axis(b32, perm[..., None], axis=-2)
    y = lax.linalg.triangular_solve(lu, bp, left_side=True, lower=True,
                                    unit_diagonal=True)
    return lax.linalg.triangular_solve(lu, y, left_side=True, lower=False)


def refined_solve(a, b, iters: int | None = None):
    """Solve a @ x = b in a.dtype via f32 LU + iterative refinement.

    a: (..., n, n), b: (..., n, k); dtype float32 or float64.
    """
    out_dtype = a.dtype
    if iters is None:
        iters = 4 if out_dtype == jnp.float64 else 2
    a32 = a.astype(jnp.float32)
    lu, _, perm = lax.linalg.lu(a32)
    x = _lu_solve_f32(lu, perm, b.astype(jnp.float32)).astype(out_dtype)

    def body(_, x):
        r = b - jnp.matmul(a, x, precision="highest")
        dx = _lu_solve_f32(lu, perm, r.astype(jnp.float32))
        return x + dx.astype(out_dtype)

    return lax.fori_loop(0, iters, body, x)


def batch_solve(a, b):
    """Batched solve a @ x = b, choosing the fastest correct path for the
    current backend/dtype."""
    if jax.default_backend() == "cpu":
        return jnp.linalg.solve(a, b)
    return refined_solve(a, b)
