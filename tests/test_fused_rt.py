"""Fused Pallas layer-step kernels vs the XLA doubling/interaction path.

Runs the Pallas kernels in interpreter mode on CPU (tests/conftest.py forces
the CPU backend) and checks them against core.kernels — same physics, two
code paths (VERDICT round-1 item 1: the TPU hot loop must be a tested,
first-class component).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsmartmom_tpu.core.kernels import CompositeLayer, doubling, interaction
from vsmartmom_tpu.ops import fused_rt


def _inputs(s, N, K, seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    # Physical operators: reflection row sums <= scale < 1 (energy
    # conservation) so the doubling ladder keeps rho(r r) < 1.
    r = scale * rng.random((s, N, N)) / N
    t = np.eye(N)[None] * 0.8 + scale * rng.random((s, N, N)) / N
    jp = 0.1 * rng.random((s, N, K))
    jm = 0.1 * rng.random((s, N, K))
    ek = np.exp(-rng.random((s, K)))
    d_vec = np.ones(N)
    nst = 4 if N % 4 == 0 else 1
    if nst == 4:
        for q in range(N // nst):
            d_vec[q * nst + 2: q * nst + 4] = -1.0
    return tuple(jnp.asarray(a, jnp.float32)
                 for a in (r, t, jp, jm, ek, d_vec))


class TestFusedDoubling:
    @pytest.mark.parametrize("ndoubl", [0, 1, 4])
    def test_matches_xla_doubling(self, ndoubl):
        s, N, K = 8, 12, 1
        r, t, jp, jm, ek, d_vec = _inputs(s, N, K)
        ref = doubling(r, t, jp, jm, ek, ndoubl, d_vec)

        r_star = r * d_vec[None, :, None]
        jm_star = jm * d_vec[None, :, None]
        if ndoubl == 0:
            rs, ts, jps, jms = r_star, t, jp, jm_star
        else:
            rs, ts, jps, jms = fused_rt.fused_doubling(
                r_star, t, jp, jm_star, ek, ndoubl, block=4, interpret=True)
        # unstar
        r_mp = rs * d_vec[None, :, None]
        jm_u = jms * d_vec[None, :, None]
        np.testing.assert_allclose(r_mp, ref.r_mp, rtol=0, atol=2e-6)
        np.testing.assert_allclose(ts, ref.t_pp, rtol=0, atol=2e-6)
        np.testing.assert_allclose(jps, ref.j0_p, rtol=0, atol=2e-6)
        np.testing.assert_allclose(jm_u, ref.j0_m, rtol=0, atol=2e-6)

    def test_two_sources(self):
        s, N, K = 4, 8, 2
        r, t, jp, jm, ek, d_vec = _inputs(s, N, K, seed=3)
        ref = doubling(r, t, jp, jm, ek, 3, d_vec)
        rs, ts, jps, jms = fused_rt.fused_doubling(
            r * d_vec[None, :, None], t, jp, jm * d_vec[None, :, None],
            ek, 3, block=4, interpret=True)
        np.testing.assert_allclose(jps, ref.j0_p, rtol=0, atol=2e-6)
        np.testing.assert_allclose(jms * d_vec[None, :, None], ref.j0_m,
                                   rtol=0, atol=2e-6)


class TestFusedLayerStep:
    def test_matches_xla_layer(self):
        s, N, K, ndoubl = 8, 12, 1, 3
        r, t, jp, jm, ek, d_vec = _inputs(s, N, K, seed=1)
        add = doubling(r, t, jp, jm, ek, ndoubl, d_vec)
        # a non-trivial composite: the same layer added once before
        comp0 = interaction(
            CompositeLayer(add.r_mp, add.r_pm, add.t_pp, add.t_mm,
                           add.j0_p, add.j0_m), add)
        ref = interaction(comp0, add)

        comp_t = (comp0.R_mp, comp0.R_pm, comp0.T_pp, comp0.T_mm,
                  comp0.J0_p, comp0.J0_m)
        out = fused_rt.fused_layer_step(
            comp_t, r * d_vec[None, :, None], t, jp,
            jm * d_vec[None, :, None], ek, d_vec, ndoubl,
            block=4, interpret=True)
        for got, want in zip(out, ref):
            np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)

    def test_ns_vs_exact_inverse_thick(self):
        """Newton-Schulz must converge even for a strongly reflecting
        composite (rho(R+- r-+) large): compare against explicit solve."""
        s, N = 4, 12
        rng = np.random.default_rng(5)
        # symmetric positive random reflections with spectral radius ~0.8
        A = rng.random((s, N, N)).astype(np.float32)
        A = 0.8 * A / np.abs(np.linalg.eigvals(A)).max(axis=-1)[:, None, None]
        S = jnp.asarray(A)
        inv_ns = fused_rt._ns_inverse(S, fused_rt.NS_ITERS)
        inv_exact = jnp.linalg.inv(jnp.eye(N)[None] - S)
        np.testing.assert_allclose(np.asarray(inv_ns), np.asarray(inv_exact),
                                   rtol=0, atol=1e-4 * float(
                                       jnp.abs(inv_exact).max()))
