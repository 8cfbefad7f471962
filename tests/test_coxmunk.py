"""Cox-Munk ocean surface tests (mirrors reference test_coxmunk.jl) plus the
ocean_coxmunk.yaml end-to-end invariants."""

import numpy as np
import pytest

from vsmartmom_tpu.surfaces import coxmunk as CM
from vsmartmom_tpu.utils.quadrature import gauleg


class TestFresnel:
    def test_normal_incidence(self):
        r_s, r_p = CM.fresnel_coefficients(1.33 + 0j, 1.0)
        assert np.isclose(abs(r_s) ** 2, ((1.33 - 1) / (1.33 + 1)) ** 2,
                          atol=1e-10)
        assert np.isclose(abs(r_s) ** 2, abs(r_p) ** 2, atol=1e-12)

    def test_brewster(self):
        n = 1.33
        cos_b = np.cos(np.arctan(n))
        _, r_p = CM.fresnel_coefficients(n + 0j, cos_b)
        assert abs(r_p) < 1e-10

    def test_grazing(self):
        r_s, r_p = CM.fresnel_coefficients(1.33 + 0j, 1e-4)
        assert abs(r_s) ** 2 > 0.99 and abs(r_p) ** 2 > 0.99

    def test_mueller_structure(self):
        r_s, r_p = CM.fresnel_coefficients(1.33 + 1e-8j, 0.7)
        M = CM.fresnel_mueller(r_s, r_p, 4)
        assert np.allclose(M[:2, 2:], 0) and np.allclose(M[2:, :2], 0)
        assert np.isclose(M[0, 1], M[1, 0])
        assert np.isclose(M[2, 2], M[3, 3])
        assert np.isclose(M[2, 3], -M[3, 2])
        assert M[0, 0] >= abs(M[0, 1]) and M[0, 0] <= 1.0


class TestRotation:
    def test_identity_and_composition(self):
        L0 = CM.stokes_rotation(0.0, 4)
        assert np.allclose(L0, np.eye(4), atol=1e-15)
        a, b = 0.3, 0.5
        assert np.allclose(CM.stokes_rotation(a, 4) @ CM.stokes_rotation(b, 4),
                           CM.stokes_rotation(a + b, 4), atol=1e-12)

    def test_orthogonality(self):
        L = CM.stokes_rotation(0.7, 4)
        assert np.allclose(L.T @ L, np.eye(4), atol=1e-12)


class TestWater:
    def test_visible(self):
        n = CM.water_refractive_index(550.0)
        assert np.isclose(n.real, 1.333, atol=0.005)
        assert n.imag < 1e-6

    def test_nir_absorption(self):
        assert CM.water_refractive_index(1500.0).imag > \
            CM.water_refractive_index(550.0).imag


class TestHelpers:
    def test_slope_variance(self):
        assert np.isclose(CM.CoxMunkSurface(0.0).sigma2(), 0.003)
        assert np.isclose(CM.CoxMunkSurface(10.0).sigma2(), 0.003 + 0.0512)

    def test_whitecap(self):
        assert CM.whitecap_fraction(0.0) == 0.0
        assert np.isclose(CM.whitecap_fraction(10.0), 2.95e-6 * 10 ** 3.52,
                          rtol=1e-6)
        assert 0.01 < CM.whitecap_fraction(15.0) < 0.10

    def test_shadow(self):
        s2 = CM.CoxMunkSurface(7.0).sigma2()
        S_zen = 1.0 / (1.0 + 2 * CM._smith_lambda(0.99, s2))
        S_graz = 1.0 / (1.0 + 2 * CM._smith_lambda(0.05, s2))
        assert S_zen > 0.9 and 0.0 < S_graz < S_zen


class TestBRDF:
    surf = CM.CoxMunkSurface(5.0)

    def test_reciprocity(self):
        M_fwd = CM.cox_munk_mueller(self.surf, 4, 0.7, 0.4, 0.9)
        M_rev = CM.cox_munk_mueller(self.surf, 4, 0.4, 0.7, 0.9)
        assert np.isclose(M_fwd[0, 0], M_rev[0, 0], rtol=1e-6)

    def test_specular_peak_wind(self):
        # specular geometry: mu_i = mu_r, dphi = 0 (flat facet in this
        # direction convention — see test_coxmunk.jl:238-250)
        lo = CM.cox_munk_mueller(CM.CoxMunkSurface(1.0, include_whitecaps=False),
                                 1, 0.7, 0.7, 0.0, n_water=1.33 + 0j)
        hi = CM.cox_munk_mueller(CM.CoxMunkSurface(20.0, include_whitecaps=False),
                                 1, 0.7, 0.7, 0.0, n_water=1.33 + 0j)
        assert lo[0, 0] > 5 * hi[0, 0]

    def test_energy_conservation(self):
        """Integrated directional-hemispherical reflectance <= 1."""
        surf = CM.CoxMunkSurface(5.0, include_whitecaps=False)
        mu, wmu = gauleg(32, 0.0, 1.0)
        phi, wphi = gauleg(64, 0.0, np.pi)
        M = CM.cox_munk_mueller(surf, 1, mu[:, None], 0.6, phi[None, :])
        # integral of BRDF * mu over hemisphere (x2 for phi in [0, 2pi])
        integral = 2 * np.einsum("i,p,ip->", wmu * mu, wphi, M[..., 0, 0])
        assert integral <= 1.02

    def test_fourier_moments(self):
        surf = CM.CoxMunkSurface(5.0)
        mu, _ = gauleg(4, 0.0, 1.0)
        grid, phi, w = CM.coxmunk_mueller_grid(surf, 4, mu)
        R0 = CM.coxmunk_reflectance_fourier(grid, phi, w, 4, 0)
        R10 = CM.coxmunk_reflectance_fourier(grid, phi, w, 4, 10)
        assert R0.shape == (16, 16) and np.all(np.isfinite(R0))
        assert np.abs(R10).max() / 2 < np.abs(R0).max()
        # I-Q coupling present
        assert np.abs(R0[1::4, 0::4]).max() > 0


class TestOceanScene:
    @pytest.fixture(scope="class")
    def result(self):
        from vsmartmom_tpu import (model_from_parameters, parameters_from_yaml,
                                   rt_run)
        import os
        path = "/root/reference/config/ocean_coxmunk.yaml"
        if not os.path.exists(path):
            pytest.skip("reference config not present")
        model = model_from_parameters(parameters_from_yaml(path))
        R, T = rt_run(model)
        return R, model

    def test_physical(self, result):
        R, model = result
        I = R[:, 0, :]
        assert np.all(np.isfinite(R))
        assert np.all(I > 0)

    def test_principal_plane_symmetry(self, result):
        """U and V vanish in the principal plane (vaz 0/180)."""
        R, _ = result
        assert np.abs(R[:, 2, :]).max() < 1e-10
        assert np.abs(R[:, 3, :]).max() < 1e-10

    def test_glint_geometry_brightest_q(self, result):
        """The specular direction (vza=sza=30, vaz=0) carries the glint."""
        R, model = result
        vza = np.asarray(model.params.vza)
        vaz = np.asarray(model.params.vaz)
        i_glint = int(np.where((vza == 30) & (vaz == 0))[0][0])
        Q = R[:, 1, 0]
        assert Q[i_glint] == Q.max()


class TestWindTangent:
    """Analytic d(Mueller)/d(wind_speed) vs float64 central FD — the
    sigma^2 chain of cox_munk_mueller_wind_tangent (reference
    coxmunk_surface.jl:61-101)."""

    @pytest.mark.parametrize("U,shadow,wc", [
        (5.0, True, True), (2.0, False, True), (12.0, True, False)])
    def test_mueller_tangent_vs_fd(self, U, shadow, wc):
        from vsmartmom_tpu.surfaces.coxmunk import (
            CoxMunkSurface, cox_munk_mueller, cox_munk_mueller_wind_tangent)
        mu = np.array([0.95, 0.7, 0.4])
        phi = np.linspace(0.1, np.pi - 0.1, 7)
        args = (4, mu[:, None, None], mu[None, :, None],
                phi[None, None, :])

        def surf(u):
            return CoxMunkSurface(wind_speed=u, shadowing=shadow,
                                  include_whitecaps=wc)
        M, dM = cox_munk_mueller_wind_tangent(surf(U), *args)
        np.testing.assert_allclose(
            M, cox_munk_mueller(surf(U), *args), rtol=0, atol=0)
        h = 1e-5 * U
        fd = (cox_munk_mueller(surf(U + h), *args)
              - cox_munk_mueller(surf(U - h), *args)) / (2 * h)
        scale = np.abs(dM).max()
        np.testing.assert_allclose(dM, fd, rtol=0, atol=2e-6 * scale)

    def test_tms_tangent_vs_fd(self):
        from vsmartmom_tpu.surfaces.coxmunk import (CoxMunkSurface,
                                                    tms_correction)
        U = 6.0
        tau = np.array([0.1, 0.3])
        kw = dict(ns=4, vza_deg=[30.0, 10.0], vaz_deg=[0.0, 120.0],
                  mu0=np.cos(np.deg2rad(30.0)), tau_total=tau, m_max=6)
        base, d_tms = tms_correction(CoxMunkSurface(U), wind_tangent=True,
                                     **kw)
        np.testing.assert_allclose(
            base, tms_correction(CoxMunkSurface(U), **kw), rtol=0, atol=0)
        h = 1e-5 * U
        fd = (tms_correction(CoxMunkSurface(U + h), **kw)
              - tms_correction(CoxMunkSurface(U - h), **kw)) / (2 * h)
        scale = max(np.abs(d_tms).max(), 1e-30)
        np.testing.assert_allclose(d_tms, fd, rtol=0, atol=2e-6 * scale)
