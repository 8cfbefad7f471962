"""Forward-model smoke and invariant tests (reference test_forward_noRS.jl)."""

import numpy as np
import pytest

from vsmartmom_tpu import (model_from_parameters, parameters_from_yaml,
                           rt_run)
from vsmartmom_tpu.core.model import Parameters, SurfaceDescriptor
from vsmartmom_tpu.core.solver import rt_solve
from vsmartmom_tpu.scattering.stokes import STOKES_I, STOKES_IQU

QUICKSTART = "/root/reference/config/quickstart.yaml"


def _quickstart_params():
    import os
    if os.path.exists(QUICKSTART):
        return parameters_from_yaml(QUICKSTART)
    return Parameters(
        spec_bands=[np.array([12987.0])],
        surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [0.15])],
        nstreams=3, polarization=STOKES_I,
        sza=60.0, vza=[60.0], vaz=[180.0], obs_alt=1000.0,
        T=np.array([250.0, 275.0]), p=np.array([100.0, 500.0, 1000.0]),
        depol=-1.0)


class TestQuickstart:
    def test_forward_runs(self):
        model = model_from_parameters(_quickstart_params())
        R, T = rt_run(model)
        assert R.shape == (1, 1, 1) and T.shape == (1, 1, 1)
        assert np.all(np.isfinite(R)) and np.all(np.isfinite(T))
        assert R[0, 0, 0] > 0 and T[0, 0, 0] > 0

    def test_auto_depol(self):
        model = model_from_parameters(_quickstart_params())
        band = model.bands[0]
        assert 0.025 < band.depol_rayleigh < 0.032
        assert 0.005 < band.depol_cabannes < 0.010


class TestInvariants:
    def _model(self, pol=STOKES_IQU, albedo=0.0, nspec=3):
        nu0 = 1e7 / 440.0
        params = Parameters(
            spec_bands=[nu0 + np.arange(nspec, dtype=float)],
            surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [albedo])],
            nstreams=6, polarization=pol,
            sza=45.0, vza=[15.0, 35.0, 55.0], vaz=[30.0, 30.0, 30.0],
            obs_alt=1000.0,
            T=np.array([220.0, 250.0, 270.0]),
            p=np.array([10.0, 300.0, 700.0, 1000.0]),
            depol=0.0)
        return model_from_parameters(params)

    def test_energy_conservation(self):
        """Conservative Rayleigh + black surface: reflected + transmitted
        (diffuse + direct) flux equals the incident mu0*F0."""
        model = self._model()
        model.bands[0].tau_rayl[:] = 0.3 / model.profile.nz
        inputs, config = model.build_band(0)
        out = rt_solve(inputs, config)
        qp, wt = model.quad.qp_mu, model.quad.wt_mu
        mu0 = model.mu0
        n = config.n_stokes
        Jup = np.asarray(out["J0_up_toa"])[0].reshape(-1, n)[:, 0]
        Jdn = np.asarray(out["J0_dn_boa"])[0].reshape(-1, n)[:, 0]
        f_up = np.sum(wt * qp * Jup)
        f_dn = np.sum(wt * qp * Jdn)
        f_dir = mu0 * np.exp(-0.3 / mu0)
        # Exact-elemental + doubling conserves to quadrature/discretization
        # level (~1e-5 relative at these stream counts).
        assert np.isclose(f_up + f_dn + f_dir, mu0, rtol=1e-4)

    def test_stokes_physical(self):
        model = self._model()
        model.bands[0].tau_rayl[:] = 0.2 / model.profile.nz
        R, T = rt_run(model)
        I, Q, U = R[:, 0], R[:, 1], R[:, 2]
        assert np.all(I > 0)
        assert np.all(np.sqrt(Q ** 2 + U ** 2) <= I)

    def test_distinct_vza_distinct_radiance(self):
        model = self._model()
        R, _ = rt_run(model)
        assert len({round(float(x), 10) for x in R[:, 0, 0]}) == 3

    def test_albedo_monotonic(self):
        r = []
        for albedo in (0.0, 0.2, 0.5):
            model = self._model(albedo=albedo)
            R, _ = rt_run(model)
            r.append(R[0, 0, 0])
        assert r[0] < r[1] < r[2]

    def test_spectral_batch_consistency(self):
        """Each spectral point must solve independently: batching 3 identical
        wavelengths gives 3 identical columns."""
        model = self._model()
        model.bands[0].tau_rayl[:] = 0.1 / model.profile.nz
        R, T = rt_run(model)
        assert np.allclose(R[..., 0], R[..., 1]) and np.allclose(R[..., 0], R[..., 2])

    def test_float32_close_to_float64(self):
        model = self._model()
        R64, _ = rt_run(model)
        model.params.float_type = np.float32
        R32, _ = rt_run(model)
        assert np.allclose(R32, R64, rtol=5e-3)
