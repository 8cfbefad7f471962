"""Fast unit tests for the setup-physics layers (host NumPy) and the core
solver invariants. Mirrors the reference's unit-test strategy
(test_quadpoints_streams.jl, test_Scattering.jl, test_forward_noRS.jl)."""

import numpy as np
import pytest

from vsmartmom_tpu.core.atmosphere import (compute_atmos_profile_fields,
                                           doubling_number,
                                           rayleigh_layer_tau)
from vsmartmom_tpu.inelastic.molecular import air_depolarization
from vsmartmom_tpu.scattering.greek import greek_rayleigh
from vsmartmom_tpu.scattering.legendre import (compute_associated_legendre_PRT,
                                               compute_legendre_poly)
from vsmartmom_tpu.scattering.stokes import (STOKES_I, STOKES_IQU,
                                             STOKES_IQUV)
from vsmartmom_tpu.scattering.zmatrix import compute_Z_moments
from vsmartmom_tpu.utils.quadrature import gauleg, rt_set_streams


class TestQuadrature:
    def test_gauleg_integrates_polynomials(self):
        x, w = gauleg(8, 0.0, 1.0)
        for k in range(2 * 8):
            assert np.isclose(np.sum(w * x ** k), 1.0 / (k + 1), rtol=1e-12)

    def test_stream_contract(self):
        qp = rt_set_streams(3, 60.0, [60.0], 1)
        # 3 weighted Gauss nodes + vza/sza appended zero-weight (deduped)
        assert qp.Nstreams == 3
        assert np.count_nonzero(qp.wt_mu == 0) == qp.Nquad - 3
        assert np.isclose(qp.qp_mu[qp.i_mu0], 0.5)
        assert np.isclose(np.sum(qp.wt_mu), 1.0)

    def test_stokes_expansion(self):
        qp = rt_set_streams(4, 30.0, [10.0, 20.0], 4)
        assert len(qp.qp_mu_N) == 4 * qp.Nquad
        assert np.allclose(qp.qp_mu_N[::4], qp.qp_mu)


class TestLegendre:
    def test_p_matches_scipy(self):
        from scipy.special import sph_harm_y
        mu = np.array([0.3, 0.7])
        l_max = 6
        P, R, T = compute_associated_legendre_PRT(mu, l_max)
        # Y_l^m(theta, 0) = sqrt((2l+1)/(4pi)) * sqrt((l-m)!/(l+m)!) P_l^m,
        # with Condon-Shortley phase; our P uses sqrt((l-m)!/(l+m)!) P_l^m
        # without the (-1)^m phase.
        for i, x in enumerate(mu):
            theta = np.arccos(x)
            for m in range(l_max):
                for l in range(m, l_max):
                    y = sph_harm_y(l, m, theta, 0.0).real
                    expected = y / np.sqrt((2 * l + 1) / (4 * np.pi))
                    expected *= (-1.0) ** m    # undo Condon-Shortley
                    assert np.isclose(P[i, l, m], expected, atol=1e-12), (l, m)

    def test_legendre_poly_values(self):
        x = np.linspace(-1, 1, 11)
        P0 = compute_legendre_poly(x, 5)[0]
        assert np.allclose(P0[:, 2], 0.5 * (3 * x ** 2 - 1))
        assert np.allclose(P0[:, 3], 0.5 * (5 * x ** 3 - 3 * x))


class TestZMatrix:
    def test_isotropic_normalization(self):
        """For an isotropic phase function (beta = [1]), Z(m=0) == 1 and the
        half-space quadrature satisfies sum_i (w_i/2)(Z++ + Z-+) = 1."""
        from vsmartmom_tpu.scattering.greek import GreekCoefs
        gk = GreekCoefs(*(np.array(v) for v in
                          ([0.0], [1.0], [0.0], [0.0], [0.0], [0.0])))
        mu, w = gauleg(6, 0, 1)
        Zpp, Zmp = compute_Z_moments(STOKES_I, mu, gk, 0)
        assert np.allclose(Zpp, 1.0)
        assert np.allclose(Zmp, 1.0)

    @pytest.mark.parametrize("pol", [STOKES_I, STOKES_IQU, STOKES_IQUV])
    def test_rayleigh_phase_normalization(self, pol):
        """Energy normalization: sum_i (w_i/2) (Z++ + Z-+)[i_I, j_I] = 1 on the
        intensity rows for every incident stream (conservative scattering)."""
        gk = greek_rayleigh(0.0279)
        mu, w = gauleg(8, 0, 1)
        Zpp, Zmp = compute_Z_moments(pol, mu, gk, 0)
        n = pol.n
        wN = np.repeat(w, n)
        rows_I = np.arange(len(mu) * n) % n == 0
        for j in range(0, len(mu) * n, n):   # incident I component
            total = np.sum(wN[rows_I] / 2 * (Zpp[rows_I, j] + Zmp[rows_I, j]))
            assert np.isclose(total, 1.0, rtol=1e-10)

    def test_m_beyond_support_is_zero(self):
        gk = greek_rayleigh(0.0)
        mu, _ = gauleg(4, 0, 1)
        Zpp, Zmp = compute_Z_moments(STOKES_IQUV, mu, gk, 3)
        assert np.all(Zpp == 0) and np.all(Zmp == 0)


class TestMolecular:
    def test_air_depol_visible(self):
        """Known values: Rayleigh depol of air ~0.028-0.030 in the visible
        (Young 1980); Cabannes depol ~0.007; Cabannes fraction ~0.96."""
        d_ray, d_cab, pi_cab = air_depolarization(1e7 / 770.0)
        assert 0.025 < d_ray < 0.032
        assert 0.005 < d_cab < 0.010
        assert 0.95 < pi_cab < 0.98

    def test_depol_wavelength_dependence(self):
        # The reference's molecular model holds the anisotropy gamma constant
        # while alpha grows toward resonance, so auto-depol varies only
        # weakly with wavelength (both values near 0.028).
        d_blue = air_depolarization(1e7 / 360.0)[0]
        d_red = air_depolarization(1e7 / 770.0)[0]
        assert abs(d_blue - d_red) < 2e-3 and d_blue != d_red


class TestAtmosphere:
    def test_profile_column_mass(self):
        prof = compute_atmos_profile_fields(
            np.array([250.0, 275.0]), np.array([100.0, 500.0, 1000.0]))
        # Dry air column for 1000 hPa minus 100 hPa TOA ~ 1.9e25 molec/cm2
        assert 1.5e25 < prof.vcd_dry.sum() < 2.2e25
        assert np.all(prof.dz > 0)

    def test_rayleigh_tau_magnitude(self):
        prof = compute_atmos_profile_fields(
            np.array([250.0, 275.0]), np.array([0.01, 500.0, 1013.25]))
        tau = rayleigh_layer_tau(1013.25, 0.53, 0.0279, prof.vcd_dry)
        # Bodhaine 1999: tau_Rayleigh(530 nm, sea level) ~ 0.113
        assert 0.10 < tau.sum() < 0.125

    def test_doubling_number(self):
        dtau, nd = doubling_number(1e-3, 0.5)
        assert dtau <= 1e-3 and np.isclose(dtau * 2 ** nd, 0.5)
        assert doubling_number(1.0, 0.5) == (0.5, 0)
