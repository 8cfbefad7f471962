"""Batched small-matrix linear algebra for the RT solver.

TPU-native replacement for the reference's batch_inv!/batch_solve! layer
(/root/reference/ext/gpu_batched_cuda.jl:97-182 CUBLAS batched LU;
tools/ka_batched_kernels.jl:118-196 portable LU) — the hottest non-GEMM op
in the solver: one ``(I - R R)^{-1} X`` per doubling step and two per
interaction, batched over the spectral axis.

Backend policy:
* CPU: ``jnp.linalg.solve`` (LAPACK batched LU, full precision).
* TPU: GEMM-only Newton-Schulz inverse + defect correction (``ns_solve``).
  XLA's LuDecomposition/TriangularSolve lower to *sequential* length-N inner
  loops of tiny dynamic-slice ops — measured ~6 ms per batched (s, 52, 52)
  solve on TPU v5e, 100x the cost of the GEMMs around it (the round-1 full
  solve spent 26 s in 5280 such solves). The RT systems are all
  ``A = I - S`` with spectral radius rho(S) < 1 (products of reflection
  operators; energy conservation), exactly the class where Newton-Schulz
  converges quadratically from the Neumann seed M0 = I + S:
  ``||I - M_k A|| = rho^(2^(k+1))``, so 6 iterations reach rho^128
  (rho = 0.8 -> 4e-13) and each defect-correction step contracts by that
  factor again. Everything is batched matmuls at precision="highest" — pure
  MXU work.
"""

import jax
import jax.numpy as jnp
from jax import lax

#: Newton-Schulz iteration count: ||I - M A|| = rho^(2^(k+1)) after k iters.
NS_ITERS = 6
#: Defect-correction steps applied to the solution (each costs 2 GEMMs and
#: contracts the error by ||I - M A||).
NS_REFINE = 2


#: Residual-checked refinement: relative-residual target and step cap.
#: Newton-Schulz error after the fixed iterations is rho^(2^(k+1)); for
#: near-conservative scenes (ssa -> 1 thick cloud over a bright surface)
#: rho can approach 1 and the fixed count silently under-converges — the
#: while-loop below keeps applying defect-correction steps (2 GEMMs each,
#: contraction factor ||I - M A|| < 1 whenever rho(S) < 1) until the
#: residual meets the target, so accuracy no longer depends on the
#: worst-case calibration of NS_ITERS.
RESID_RTOL = 1e-6
RESID_MAX_STEPS = 12


def ns_solve(a, b, ns_iters: int = NS_ITERS, refine: int = NS_REFINE):
    """GEMM-only batched solve of a @ x = b for a = I - S, rho(S) < 1.

    a: (..., n, n), b: (..., n, k). Works in a.dtype on the MXU; no LU, no
    triangular solves, no sequential inner loops. After ``refine`` fixed
    defect-correction steps, further steps run under a residual check
    until ``||b - A x|| <= RESID_RTOL * ||b||`` (max RESID_MAX_STEPS).
    """
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    two_eye = 2.0 * eye

    def mm(x, y):
        return jnp.matmul(x, y, precision="highest")

    m = two_eye - a                       # = I + S, the 2-term Neumann seed

    def ns_step(_, m):
        return mm(m, two_eye - mm(a, m))

    m = lax.fori_loop(0, ns_iters, ns_step, m)
    x = mm(m, b)

    def refine_step(_, x):
        return x + mm(m, b - mm(a, x))

    x = lax.fori_loop(0, refine, refine_step, x)

    b_norm = jnp.max(jnp.abs(b))

    def not_converged(state):
        x, i = state
        r_norm = jnp.max(jnp.abs(b - mm(a, x)))
        return (r_norm > RESID_RTOL * b_norm) & (i < RESID_MAX_STEPS)

    def extra_step(state):
        x, i = state
        return x + mm(m, b - mm(a, x)), i + 1

    x, _ = lax.while_loop(not_converged, extra_step, (x, jnp.int32(0)))
    return x


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
    current backend/dtype. The non-CPU path assumes the RT structure
    a = I - S with rho(S) < 1 (every call site in this package)."""
    if jax.default_backend() == "cpu":
        return jnp.linalg.solve(a, b)
    return ns_solve(a, b)
