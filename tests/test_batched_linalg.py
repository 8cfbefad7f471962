"""Batched linear algebra: the GEMM-only Newton-Schulz solve must match the
LAPACK solve on RT-structured systems A = I - S, rho(S) < 1
(reference test/test_batched_kernels.jl — KA kernels vs backslash)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsmartmom_tpu.ops.batched_linalg import batch_solve, ns_solve


def _rt_like_system(rho, s=16, n=24, k=3, seed=0):
    """A = I - S with spectral radius exactly rho (scaled random S with
    nonnegative entries, like products of reflection operators)."""
    rng = np.random.default_rng(seed)
    S = rng.random((s, n, n))
    for i in range(s):
        ev = np.max(np.abs(np.linalg.eigvals(S[i])))
        S[i] *= rho / ev
    b = rng.standard_normal((s, n, k))
    return jnp.asarray(np.eye(n)[None] - S), jnp.asarray(b)


class TestNewtonSchulzSolve:
    @pytest.mark.parametrize("rho", [0.1, 0.5, 0.8, 0.9])
    def test_matches_lapack(self, rho):
        a, b = _rt_like_system(rho)
        x_ref = np.asarray(jnp.linalg.solve(a, b))
        x_ns = np.asarray(ns_solve(a, b))
        scale = np.abs(x_ref).max()
        assert np.abs(x_ns - x_ref).max() / scale < 5e-6, rho

    def test_f32(self):
        a, b = _rt_like_system(0.8)
        a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
        x_ref = np.asarray(jnp.linalg.solve(a, b))
        x_ns = np.asarray(ns_solve(a32, b32))
        scale = np.abs(x_ref).max()
        assert np.abs(x_ns - x_ref).max() / scale < 5e-5

    def test_identity(self):
        n = 8
        a = jnp.broadcast_to(jnp.eye(n), (4, n, n))
        b = jnp.asarray(np.random.default_rng(1).random((4, n, 2)))
        assert np.allclose(np.asarray(ns_solve(a, b)), np.asarray(b),
                           atol=1e-12)

    def test_batch_solve_dispatch(self):
        """batch_solve on CPU uses LAPACK; result must equal ns_solve."""
        a, b = _rt_like_system(0.5)
        x1 = np.asarray(batch_solve(a, b))
        x2 = np.asarray(ns_solve(a, b))
        assert np.abs(x1 - x2).max() < 1e-9
