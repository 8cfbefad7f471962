"""Canopy surface tests (reference test/test_canopy.jl).

Covers the bi-Lambertian spherical-LAD phase expansion, Z-matrix flux
normalization, the LAI -> 0 soil limit, energy conservation with
non-absorbing leaves + unit soil, spectral leaf optics, clumping, and YAML
parsing of the canopy section.
"""

import numpy as np
import pytest

from vsmartmom_tpu.core.model import (Parameters, SurfaceDescriptor,
                                      model_from_parameters)
from vsmartmom_tpu.core.solver import rt_run, rt_run_full
from vsmartmom_tpu.io.yaml_input import parameters_from_dict
from vsmartmom_tpu.scattering.stokes import polarization_from_name
from vsmartmom_tpu.scattering.zmatrix import compute_Z_moments
from vsmartmom_tpu.surfaces.canopy import (CanopySurface, bilambertian_greek,
                                           bilambertian_phase)
from vsmartmom_tpu.utils.quadrature import gauleg

T33 = np.linspace(244.0, 285.0, 33)
P34 = np.logspace(np.log10(0.14), np.log10(980.0), 34)


def _run(surface, n_spec=2, pol="Stokes_I", nstreams=6):
    params = Parameters(
        spec_bands=[19417.0 + np.arange(n_spec, dtype=np.float64)],
        surfaces=[surface], nstreams=nstreams,
        polarization=polarization_from_name(pol),
        sza=30.0, vza=[0.0, 30.0, 60.0], vaz=[0.0, 0.0, 0.0],
        obs_alt=1000.0, T=T33, p=P34, profile_reduction=5,
        depol=-1.0, float_type=np.float64)
    return model_from_parameters(params)


def _canopy_desc(**kw):
    soil = kw.pop("soil", SurfaceDescriptor("LambertianSurfaceScalar", [0.10]))
    return SurfaceDescriptor(
        "CanopySurface", [], {"_surface_obj": CanopySurface(soil=soil, **kw)})


class TestBilambertianPhase:
    def test_normalization(self):
        """(1/2) Integral p(mu) dmu = 1 (Greek beta_0 = 1)."""
        for rho, tau in [(0.4, 0.05), (0.5, 0.5), (0.1, 0.0), (0.0, 0.3)]:
            gk = bilambertian_greek(rho, tau, 32)
            assert gk.beta[0] == pytest.approx(1.0, abs=1e-10)

    def test_phase_nonnegative(self):
        mu = np.linspace(-1, 1, 201)
        p = bilambertian_phase(mu, 0.4, 0.05)
        assert np.all(p >= -1e-12)

    def test_symmetric_leaf_zero_asymmetry(self):
        """rho == tau -> the cos(beta) terms cancel -> g = beta_1/3 = 0."""
        gk = bilambertian_greek(0.3, 0.3, 16)
        assert abs(gk.beta[1]) < 1e-12

    def test_pure_reflector_backscatter(self):
        """tau = 0: no forward scattering (p(beta=0) = 0)."""
        assert bilambertian_phase(np.array([1.0]), 0.5, 0.0)[0] == \
            pytest.approx(0.0, abs=1e-12)

    def test_z_flux_normalization(self):
        """Sum_i w_i (Zpp + Zmp)[i, j] at m = 0 ~ 2 (energy conservation in
        the adding-doubling convention; reference test_canopy.jl:75-77)."""
        pol = polarization_from_name("Stokes_I")
        mu, w = gauleg(8)
        gk = bilambertian_greek(0.5, 0.5, 48)
        Zpp, Zmp = compute_Z_moments(pol, mu, gk, 0)
        flux = np.array([np.sum(w * (Zpp[:, j] + Zmp[:, j]))
                         for j in range(len(mu))])
        np.testing.assert_allclose(flux, 2.0, rtol=3e-3, atol=3e-3)


class TestCanopyRT:
    def test_lai_zero_is_soil(self):
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.10])
        R_soil, T_soil, *_ = rt_run(_run(soil))
        R_c, T_c, *_ = rt_run(_run(_canopy_desc(soil=soil, LAI=1e-9)))
        np.testing.assert_allclose(R_c, R_soil, rtol=1e-7)
        np.testing.assert_allclose(T_c, T_soil, rtol=1e-7)

    def test_bright_canopy_over_dark_soil_brightens(self):
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.05])
        R_soil, *_ = rt_run(_run(soil))
        R_c, *_ = rt_run(_run(_canopy_desc(
            soil=soil, LAI=4.0, leaf_reflectance=0.45,
            leaf_transmittance=0.45)))
        assert np.all(R_c > R_soil)
        assert np.all(np.isfinite(R_c)) and np.all(R_c > 0)

    def test_dark_canopy_over_bright_soil_darkens(self):
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.60])
        R_soil, *_ = rt_run(_run(soil))
        R_c, *_ = rt_run(_run(_canopy_desc(
            soil=soil, LAI=4.0, leaf_reflectance=0.05,
            leaf_transmittance=0.01)))
        assert np.all(R_c < R_soil)

    def test_energy_conservation_white_canopy(self):
        """Non-absorbing leaves (omega = 1) over unit-albedo soil: the
        conservative surface returns all BOA-incident energy, so the
        upwelling BOA flux equals the total (direct + diffuse) downwelling
        BOA flux. (It does NOT equal mu0: with a reflecting surface under a
        scattering atmosphere, photons cross the BOA plane multiple times.)
        """
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [1.0])
        model = _run(_canopy_desc(soil=soil, LAI=3.0,
                                  leaf_reflectance=0.5,
                                  leaf_transmittance=0.5))
        out = rt_run_full(model)
        np.testing.assert_allclose(out["bhr_uw"], out["bhr_dw"], rtol=2e-3)
        mu0 = model.quad.qp_mu[model.quad.i_mu0]
        assert np.all(out["bhr_uw"] > mu0)   # multiple-crossing enhancement

    def test_clumping_reduces_effective_lai(self):
        """Omega < 1 -> less projected leaf area -> closer to the soil."""
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.60])
        R_soil, *_ = rt_run(_run(soil))
        kw = dict(soil=soil, LAI=2.0, leaf_reflectance=0.05,
                  leaf_transmittance=0.01)
        R_full, *_ = rt_run(_run(_canopy_desc(clumping_omega=1.0, **kw)))
        R_clump, *_ = rt_run(_run(_canopy_desc(clumping_omega=0.5, **kw)))
        assert np.all(np.abs(R_clump - R_soil) < np.abs(R_full - R_soil))

    def test_n_layers_consistent(self):
        """A homogeneous canopy split into sublayers must match 1 layer."""
        kw = dict(LAI=2.0, leaf_reflectance=0.4, leaf_transmittance=0.05)
        R1, *_ = rt_run(_run(_canopy_desc(n_layers=1, **kw)))
        R4, *_ = rt_run(_run(_canopy_desc(n_layers=4, **kw)))
        np.testing.assert_allclose(R4, R1, rtol=1e-6)

    def test_polarized_run(self):
        """IQU canopy run: finite, |Q| < I, canopy scattering depolarizes
        relative to bare Rayleigh+soil."""
        desc = _canopy_desc(LAI=3.0)
        R, *_ = rt_run(_run(desc, pol="Stokes_IQU"))
        assert np.all(np.isfinite(R))
        assert np.all(np.abs(R[:, 1, :]) < R[:, 0, :])

    def test_spectral_leaf_optics(self):
        """Leaf R/T on a wavelength grid (red-edge-like step): reflectance
        ordering follows the leaf optics across the band."""
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.10])
        lo_nu, hi_nu = 19417.0, 19427.0
        # leaf grid in nm spanning the band (~515 nm)
        lam = np.array([1e7 / hi_nu - 0.1, 1e7 / lo_nu + 0.1])
        desc = SurfaceDescriptor("CanopySurface", [], {"_surface_obj":
            CanopySurface(soil=soil, LAI=4.0,
                          leaf_reflectance=np.array([0.45, 0.05]),
                          leaf_transmittance=np.array([0.45, 0.05]),
                          leaf_optics_grid=lam, grid_unit="nm")})
        params = Parameters(
            spec_bands=[np.linspace(lo_nu, hi_nu, 5)],
            surfaces=[desc], nstreams=6,
            polarization=polarization_from_name("Stokes_I"),
            sza=30.0, vza=[0.0], vaz=[0.0], obs_alt=1000.0,
            T=T33, p=P34, profile_reduction=5, depol=-1.0,
            float_type=np.float64)
        R, *_ = rt_run(model_from_parameters(params))
        spec = R[0, 0, :]
        assert np.all(np.isfinite(spec))
        # lam decreasing in nu -> bright leaf at hi_nu end, dark at lo_nu:
        # note grid in nm maps hi_nu->small lam. Bright (0.45) sits at
        # lam[0] ~ hi_nu, so R should increase across the band.
        assert spec[-1] > spec[0]
        assert spec[-1] - spec[0] > 0.005


class TestCanopyYaml:
    def test_canopy_section(self):
        d = {
            "radiative_transfer": {
                "spec_bands": ["[19417.0 19418.0]"],
                "surface": ["LambertianSurfaceScalar(0.10)"],
                "polarization_type": "Stokes_I()",
                "nstreams": 6, "depol": -1, "float_type": "Float64",
            },
            "canopy": {
                "LAI": 3.0, "n_layers": 1, "leaf_reflectance": 0.4,
                "leaf_transmittance": 0.05, "soil": "from_surface",
                "clumping": {"type": "constant", "Omega": 0.8},
            },
            "geometry": {"sza": 30, "vza": [0, 30, 60], "vaz": [0, 0, 0],
                         "obs_alt": 1000.0},
            "atmospheric_profile": {"T": T33.tolist(), "p": P34.tolist(),
                                    "profile_reduction": 5},
        }
        params = parameters_from_dict(d)
        surf = params.surfaces[0]
        assert surf.kind == "CanopySurface"
        canopy = surf.kwargs["_surface_obj"]
        assert canopy.LAI == 3.0
        assert canopy.clumping_omega == 0.8
        assert canopy.soil.kind == "LambertianSurfaceScalar"
        R, *_ = rt_run(model_from_parameters(params))
        assert np.all(np.isfinite(R)) and np.all(R > 0)
