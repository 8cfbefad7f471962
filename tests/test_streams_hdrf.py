"""Streams export + HDRF/BHR tests.

Mirrors the reference's bit-exact plumbing check (test_CoreRT.jl:45-108):
reconstructing R from per-moment stream vectors with the postprocessing
weights must reproduce rt_run's R exactly. Plus BHR energy checks.
"""

import numpy as np
import pytest

from vsmartmom_tpu import model_from_parameters, rt_run
from vsmartmom_tpu.core.model import Parameters, SurfaceDescriptor
from vsmartmom_tpu.core.solver import rt_run_full, rt_run_streams, rt_solve
from vsmartmom_tpu.scattering.stokes import STOKES_IQUV
from vsmartmom_tpu.utils.quadrature import nearest_index


def _model(albedo=0.1):
    nu0 = 1e7 / 360.0
    params = Parameters(
        spec_bands=[np.array([nu0, nu0 + 1.0])],
        surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [albedo])],
        nstreams=6, polarization=STOKES_IQUV,
        sza=np.rad2deg(np.arccos(0.2)),
        vza=[11.4783, 23.0739, 50.2082, 73.7398],
        vaz=[0.0, 60.0, 120.0, 180.0],
        obs_alt=1000.0,
        T=np.array([231.62]), p=np.array([0.14, 0.22]),
        depol=0.0)
    model = model_from_parameters(params)
    model.bands[0].tau_rayl[:] = 0.5
    return model


class TestStreams:
    def test_fourier_stream_recovery(self):
        """Manual Fourier + nearest-stream reconstruction from the per-moment
        J vectors reproduces rt_run's R to machine precision."""
        model = _model()
        R_direct, _ = rt_run(model)
        streams = rt_run_streams(model)

        pol_n = streams["pol_n"]
        params = model.params
        n_m = streams["J_up_per_m"].shape[0]
        R_recon = np.zeros_like(R_direct)
        for iv, (vza, vaz) in enumerate(zip(params.vza, params.vaz)):
            imu = nearest_index(streams["qp_mu"], np.cos(np.deg2rad(vza)))
            rows = slice(imu * pol_n, (imu + 1) * pol_n)
            for m in range(n_m):
                cosm = np.cos(np.deg2rad(m * vaz))
                sinm = np.sin(np.deg2rad(m * vaz))
                sw = np.array([cosm, cosm, sinm, sinm][:pol_n])
                R_recon[iv] += (streams["weights"][m] * sw[:, None]
                                * streams["J_up_per_m"][m, :, rows].T)
        assert np.allclose(R_recon, R_direct, rtol=1e-10, atol=1e-14)

    def test_tau_fields(self):
        streams = rt_run_streams(_model())
        assert np.allclose(streams["tau_total"],
                           streams["tau_rayl"] + streams["tau_abs"])


class TestHDRFBHR:
    def test_bhr_energy_conservation(self):
        """Conservative Rayleigh + black surface: bhr_uw + bhr_dw-absorbed
        relations; for albedo a, bhr_uw = a * bhr_dw (Lambertian)."""
        for albedo in (0.0, 0.3):
            model = _model(albedo=albedo)
            out = rt_run_full(model)
            assert np.allclose(out["bhr_uw"], albedo * out["bhr_dw"],
                               rtol=1e-8), albedo

    def test_bhr_dw_closes_energy(self):
        """Black surface: (reflected TOA flux) + (bhr_dw at BOA) = mu0."""
        model = _model(albedo=0.0)
        inputs, config = model.build_band(0)
        out = rt_solve(inputs, config)
        qp, wt = model.quad.qp_mu, model.quad.wt_mu
        ns = config.n_stokes
        Jup = np.asarray(out["J0_up_toa"])[0].reshape(-1, ns)[:, 0]
        f_up = np.sum(wt * qp * Jup)
        bhr_dw = np.asarray(out["bhr_dw"])[0]
        assert np.isclose(f_up + bhr_dw, model.quad.mu0, rtol=1e-3)

    def test_hdrf_matches_R_black_sky_limit(self):
        """For a Lambertian surface the hdr output is the surface-leaving
        radiance; with zero albedo it vanishes."""
        model = _model(albedo=0.0)
        hdr = rt_run_full(model)["hdr"]
        assert np.abs(hdr).max() < 1e-14
