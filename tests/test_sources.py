"""Thermal emission and SIF source tests (reference test_thermal_emission.jl,
test_sif.jl): isothermal-column blackbody limit, azimuthal isotropy,
SIF Lambertian-radiance limit."""

import numpy as np
import pytest

from vsmartmom_tpu import model_from_parameters, rt_run
from vsmartmom_tpu.core.model import (AbsorptionParams, Parameters,
                                      SurfaceDescriptor)
from vsmartmom_tpu.scattering.stokes import STOKES_I
from vsmartmom_tpu.solar import (add_thermal_emission, planck_spectrum_wn,
                                 set_surface_sif)


def _tir_params(**kw):
    nu0 = 1000.0   # 10 um
    defaults = dict(
        spec_bands=[np.array([nu0, nu0 + 1.0])],
        surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [0.0])],
        nstreams=4, polarization=STOKES_I,
        sza=45.0, vza=[0.0, 40.0], vaz=[0.0, 120.0], obs_alt=0.0,
        T=np.array([260.0, 260.0, 260.0]),
        p=np.array([10.0, 400.0, 800.0, 1013.0]),
        depol=0.0, include_solar=False)
    defaults.update(kw)
    return Parameters(**defaults)


class TestPlanck:
    def test_wien_and_magnitude(self):
        # B(280 K) peaks near 550 cm^-1; value at 1000 cm^-1 ~ 40-70 mW...
        nu = np.arange(50.0, 2500.0, 10.0)
        B = planck_spectrum_wn(280.0, nu)
        assert 500 < nu[np.argmax(B)] < 600
        assert np.all(B > 0)

    def test_rayleigh_jeans_limit(self):
        # h c nu << k T: B -> c1/c2 * nu^2 * T
        nu = np.array([1.0])
        B = planck_spectrum_wn(300.0, nu)
        expected = 1.1910427e-5 / 1.4387752 * nu ** 2 * 300.0
        assert np.isclose(B[0], expected[0], rtol=1e-2)


class TestThermal:
    def test_isothermal_opaque_blackbody_limit(self):
        """Opaque isothermal absorbing column radiates B(T) at TOA
        (reference test_thermal_emission.jl isothermal-column limit)."""
        params = _tir_params()
        model = model_from_parameters(params)
        # opaque pure absorber: big tau_abs, tiny Rayleigh
        model.bands[0].tau_abs[:] = 20.0 / model.profile.nz
        add_thermal_emission(model)
        R, T = rt_run(model)
        B = planck_spectrum_wn(260.0, model.bands[0].nu_grid)
        assert np.allclose(R[:, 0, :], B[None, :], rtol=1e-4), (R[:, 0, 0], B[0])

    def test_azimuthal_isotropy(self):
        """Thermal radiance must not depend on azimuth (m=0 only)."""
        params = _tir_params(vza=[30.0, 30.0, 30.0], vaz=[0.0, 90.0, 180.0])
        model = model_from_parameters(params)
        model.bands[0].tau_abs[:] = 1.0 / model.profile.nz
        add_thermal_emission(model)
        R, _ = rt_run(model)
        assert np.allclose(R[0, 0], R[1, 0]) and np.allclose(R[0, 0], R[2, 0])

    def test_thin_limit_scales_with_tau(self):
        params = _tir_params()
        model = model_from_parameters(params)
        add_thermal_emission(model)
        model.bands[0].tau_rayl[:] = 0.0
        model.bands[0].tau_abs[:] = 1e-3 / model.profile.nz
        R1, _ = rt_run(model)
        model.bands[0].tau_abs[:] = 2e-3 / model.profile.nz
        R2, _ = rt_run(model)
        assert np.allclose(R2[:, 0, :] / R1[:, 0, :], 2.0, rtol=1e-2)

    def test_solar_plus_thermal_additive(self):
        """RT is linear in sources: solar+thermal = solar + thermal."""
        params = _tir_params(include_solar=True)
        model = model_from_parameters(params)
        model.bands[0].tau_abs[:] = 0.5 / model.profile.nz
        R_solar, _ = rt_run(model)
        add_thermal_emission(model)
        R_both, _ = rt_run(model)
        params2 = _tir_params(include_solar=False)
        model2 = model_from_parameters(params2)
        model2.bands[0].tau_abs[:] = 0.5 / model2.profile.nz
        add_thermal_emission(model2)
        R_thermal, _ = rt_run(model2)
        assert np.allclose(R_both, R_solar + R_thermal, rtol=1e-10)


class TestSIF:
    def test_sif_transparent_atmosphere_lambertian_radiance(self):
        """Black surface, transparent atmosphere: TOA radiance = SIF0 / pi
        (isotropic radiance from hemispheric irradiance)."""
        params = _tir_params(include_solar=False,
                             vza=[0.0, 40.0], vaz=[0.0, 120.0])
        model = model_from_parameters(params)
        model.bands[0].tau_rayl[:] = 1e-10
        sif0 = 1.7
        set_surface_sif(model, sif0)
        R, _ = rt_run(model)
        assert np.allclose(R[:, 0, :], sif0 / np.pi, rtol=1e-6)

    def test_sif_attenuated_by_atmosphere(self):
        params = _tir_params(include_solar=False)
        model = model_from_parameters(params)
        model.bands[0].tau_abs[:] = 0.5 / model.profile.nz
        set_surface_sif(model, 1.0)
        R, _ = rt_run(model)
        # attenuated below 1/pi, nadir less attenuated than slant
        assert np.all(R[:, 0, :] < 1 / np.pi)
        assert R[0, 0, 0] > R[1, 0, 0]


class TestSolarSpectrum:
    def test_default_solar_spectrum_lines(self):
        """The shipped default solar spectrum has a Planck continuum with
        Fraunhofer dips at the classical line positions."""
        from vsmartmom_tpu.solar import default_solar_spectrum
        nu = np.arange(1e7 / 700.0, 1e7 / 380.0, 2.0)   # 380-700 nm
        F = default_solar_spectrum(nu)
        assert F.max() <= 1.0 + 1e-12 and F.min() > 0.0
        wl = 1e7 / nu
        # Ca II K and H-alpha dips present and deep
        for wl0, min_depth in ((393.37, 0.5), (656.28, 0.5), (589.0, 0.4)):
            i = np.argmin(np.abs(wl - wl0))
            cont = np.median(F[max(0, i - 200):i + 200])
            assert F[i] < (1.0 - min_depth) * cont, wl0

    def test_f0_spec_plumbing(self):
        """default_solar_spectrum drives the solver via band.f0_spec and
        scales the radiance linearly."""
        from vsmartmom_tpu.solar import default_solar_spectrum
        params = _tir_params(include_solar=True)
        model = model_from_parameters(params)
        R0, _ = rt_run(model)
        F = 0.5 * np.ones(model.bands[0].n_spec)
        model.bands[0].f0_spec = F
        R1, _ = rt_run(model)
        assert np.allclose(R1, 0.5 * R0, rtol=1e-12)

    def test_sif_default_shape(self):
        """Shipped SIF emission shape peaks in the far-red (~740 nm)."""
        from vsmartmom_tpu.sif import default_sif_spectrum
        nu = np.arange(1e7 / 800.0, 1e7 / 650.0, 2.0)
        f = default_sif_spectrum(nu)
        wl_peak = 1e7 / nu[np.argmax(f)]
        assert 720.0 < wl_peak < 760.0
        assert np.isclose(f.max(), 0.5 * np.pi)
