"""StandaloneSS validation: analytic single-scatter formulas, cross-check
against the full MOM solver in the thin-atmosphere limit, polarized paths,
and jacfwd Jacobians vs finite differences."""

import numpy as np
import pytest

from vsmartmom_tpu.scattering.mie import hg_greek_coefficients
from vsmartmom_tpu.standalone_ss import (AbsorptionSSContributor,
                                         CoxMunkSSSurface, ExactSSConfig,
                                         GreekCoefsSSContributor,
                                         HGAerosolSSContributor,
                                         LambertianSSSurface,
                                         RayleighSSContributor, SSGeometry,
                                         run_exact_ss,
                                         run_exact_ss_with_jacobians)


def _geo():
    return SSGeometry(mu0=0.6, mu_v=np.array([0.4, 0.8]),
                      dphi=np.deg2rad([30.0, 150.0]))


class TestPath1:
    def test_thin_rayleigh_analytic(self):
        """Single thin Rayleigh layer: L = I0 P(T) tau / (4 pi mu0 mu_v)."""
        tau = 1e-5
        geo = _geo()
        cfg = ExactSSConfig(geometry=geo, surface=LambertianSSSurface(0.0),
                            contributors=[RayleighSSContributor(
                                tau=np.array([[tau]]), depol=0.0)])
        res = run_exact_ss(cfg, "path1")
        s0 = np.sqrt(1 - geo.mu0 ** 2)
        sv = np.sqrt(1 - geo.mu_v ** 2)
        cos_T = -geo.mu0 * geo.mu_v + s0 * sv * np.cos(geo.dphi)
        P = 0.75 * (1 + cos_T ** 2)
        expected = P * tau / (4 * np.pi * geo.mu0 * geo.mu_v) * geo.mu0
        assert np.allclose(res["path1"][:, 0, 0], expected, rtol=1e-4)

    def test_finite_tau_layer_factor(self):
        """Single finite layer: closed-form (1 - e^{-tau a}) factor."""
        tau = 0.4
        geo = _geo()
        cfg = ExactSSConfig(geometry=geo, surface=LambertianSSSurface(0.0),
                            contributors=[HGAerosolSSContributor(
                                g=0.5, ssa=0.9, tau=np.array([[tau]]))])
        res = run_exact_ss(cfg, "path1")
        cos_T = (-geo.mu0 * geo.mu_v + np.sqrt(1 - geo.mu0 ** 2)
                 * np.sqrt(1 - geo.mu_v ** 2) * np.cos(geo.dphi))
        P = (1 - 0.25) / (1 + 0.25 - cos_T) ** 1.5
        a = 1 / geo.mu0 + 1 / geo.mu_v
        expected = 0.9 * P / (4 * np.pi * geo.mu_v * a) * (1 - np.exp(-tau * a))
        assert np.allclose(res["path1"][:, 0, 0], expected, rtol=1e-12)


class TestPath2:
    def test_lambertian_direct(self):
        geo = _geo()
        tau = 0.2
        cfg = ExactSSConfig(geometry=geo, surface=LambertianSSSurface(0.3),
                            contributors=[AbsorptionSSContributor(
                                tau=np.array([[tau]]))])
        res = run_exact_ss(cfg, "path2")
        expected = (geo.mu0 * 0.3 / np.pi
                    * np.exp(-tau / geo.mu0) * np.exp(-tau / geo.mu_v))
        assert np.allclose(res["path2"][:, 0, 0], expected, rtol=1e-12)


class TestVsFullSolver:
    def test_thin_atmosphere_matches_mom(self):
        """For an optically thin Rayleigh column over a dark Lambertian
        surface, all-paths SS total ~= full rt_run R (MS is O(tau^2))."""
        from vsmartmom_tpu import model_from_parameters, rt_run
        from vsmartmom_tpu.core.model import Parameters, SurfaceDescriptor
        from vsmartmom_tpu.scattering.stokes import STOKES_I
        tau_tot, albedo = 0.01, 0.1
        sza, vza, vaz = 50.0, [20.0, 55.0], [40.0, 170.0]
        params = Parameters(
            spec_bands=[np.array([1e7 / 500.0])],
            surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [albedo])],
            nstreams=8, polarization=STOKES_I,
            sza=sza, vza=vza, vaz=vaz, obs_alt=0.0,
            T=np.array([250.0, 270.0]), p=np.array([100.0, 600.0, 1013.0]),
            depol=0.0)
        model = model_from_parameters(params)
        model.bands[0].tau_rayl[:] = tau_tot / 2
        R_mom, _ = rt_run(model)

        geo = SSGeometry(mu0=np.cos(np.deg2rad(sza)),
                         mu_v=np.cos(np.deg2rad(vza)),
                         dphi=np.deg2rad(vaz))
        cfg = ExactSSConfig(geometry=geo, surface=LambertianSSSurface(albedo),
                            contributors=[RayleighSSContributor(
                                tau=np.full((2, 1), tau_tot / 2), depol=0.0)])
        res = run_exact_ss(cfg, "all")
        # radiance factor convention: rt_run returns I/F0 with mu0-weighted
        # direct beam; SS total is radiance for I0=1
        rel = np.abs(res["total"][:, 0, 0] - R_mom[:, 0, 0]) / R_mom[:, 0, 0]
        assert rel.max() < 0.02, rel


class TestPolarized:
    def test_principal_plane_u_zero(self):
        geo = SSGeometry(mu0=0.7, mu_v=np.array([0.5, 0.5]),
                         dphi=np.array([0.0, np.pi]))
        greek = hg_greek_coefficients(0.4, l_max=24,
                                      polarization_fraction=0.5)
        cfg = ExactSSConfig(
            geometry=geo, surface=LambertianSSSurface(0.0),
            contributors=[GreekCoefsSSContributor(
                greek_coefs=greek, ssa=0.95, tau=np.full((1, 1), 0.1))],
            n_stokes=3)
        res = run_exact_ss(cfg, "path1")
        assert np.abs(res["path1"][:, 2, :]).max() < 1e-14
        assert np.abs(res["path1"][:, 1, :]).max() > 0

    def test_coxmunk_glint_polarized(self):
        geo = SSGeometry(mu0=0.8, mu_v=np.array([0.8]), dphi=np.array([0.0]))
        cfg = ExactSSConfig(
            geometry=geo,
            surface=CoxMunkSSSurface(wind_speed=5.0, n_water=1.34 + 0j,
                                     include_whitecaps=False),
            contributors=[AbsorptionSSContributor(tau=np.full((1, 1), 0.05))],
            n_stokes=3)
        res = run_exact_ss(cfg, "path2")
        assert res["path2"][0, 0, 0] > 0
        assert abs(res["path2"][0, 1, 0]) > 0   # Fresnel polarizes


class TestJacobians:
    def test_jacfwd_vs_fd(self):
        geo = _geo()
        base_tau = np.array([[0.1], [0.2]])
        cfg = ExactSSConfig(geometry=geo, surface=LambertianSSSurface(0.25),
                            contributors=[HGAerosolSSContributor(
                                g=0.5, ssa=0.9, tau=base_tau)])
        res, jac = run_exact_ss_with_jacobians(cfg, "all")
        assert jac["d_tau"].shape[-3:] == (1, 2, 1)

        # FD in a uniform tau scale
        h = 1e-5
        def total_at(scale, albedo=0.25, ssa=0.9):
            c = ExactSSConfig(geometry=geo,
                              surface=LambertianSSSurface(albedo),
                              contributors=[HGAerosolSSContributor(
                                  g=0.5, ssa=ssa, tau=base_tau * scale)])
            return run_exact_ss(c, "all")["total"]
        fd_tau = (total_at(1 + h) - total_at(1 - h)) / (2 * h)
        jv_tau = np.einsum("gksczS,czS->gks", jac["d_tau"],
                           base_tau[None] * 1.0)
        assert np.allclose(jv_tau, fd_tau, rtol=1e-6)

        fd_alb = (total_at(1, albedo=0.25 + h) - total_at(1, 0.25 - h)) / (2 * h)
        assert np.allclose(jac["d_albedo"].sum(-1), fd_alb, rtol=1e-6)

        fd_ssa = (total_at(1, ssa=0.9 + h) - total_at(1, ssa=0.9 - h)) / (2 * h)
        assert np.allclose(jac["d_ssa"][..., 0], fd_ssa, rtol=1e-6)
