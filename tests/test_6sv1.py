"""Published-benchmark regression: 6SV1 Rayleigh + Lambertian-surface cases.

Mirrors /root/reference/test/test_CoreRT.jl:7-43. Six cases spanning
tau = {0.1, 0.25, 0.5}, albedo = {0, 0.25}, three SZA x three relative
azimuths x sixteen VZA. Reflectance convention: R = pi * L / mu0.
Gate: max relative error < 0.006 (reference epsilon).
"""

import os

import numpy as np
import pytest

from vsmartmom_tpu import model_from_parameters, rt_run
from vsmartmom_tpu.core.model import Parameters, SurfaceDescriptor
from vsmartmom_tpu.scattering.stokes import STOKES_IQUV

DATA = os.path.join(os.path.dirname(__file__), "data", "sixsv1_R_trues.npy")

VZA = [0.0, 11.4783, 16.2602, 23.0739, 32.8599, 43.9455, 50.2082, 58.6677,
       66.4218, 71.3371, 73.7398, 78.463, 80.7931, 84.2608, 86.5602, 88.854]
AZS = [180.0, 90.0, 0.0]

CASES = [
    # (szas, lambda_nm, tau, albedo)
    ([23.0739, 53.1301, 78.4630], 530, 0.10, 0.0),
    ([0.0001, 36.8699, 66.4218], 530, 0.10, 0.25),
    ([0.0001, 36.8699, 66.4218], 440, 0.25, 0.0),
    ([23.0739, 53.1301, 78.4630], 440, 0.25, 0.25),
    ([23.0739, 53.1301, 78.4630], 360, 0.50, 0.0),
    ([0.0001, 36.8699, 66.4218], 360, 0.50, 0.25),
]


def _run(sza, az, lam_nm, tau, rho):
    nu0 = 1e7 / lam_nm
    params = Parameters(
        spec_bands=[np.array([nu0, nu0 + 1.0])],
        surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [rho])],
        nstreams=11,
        polarization=STOKES_IQUV,
        sza=sza,
        vza=VZA,
        vaz=[az] * len(VZA),
        obs_alt=1000.0,
        T=np.array([231.62]),
        p=np.array([0.14, 0.22]),
        depol=0.0,
    )
    model = model_from_parameters(params)
    model.bands[0].tau_rayl[:] = tau
    R, _ = rt_run(model)
    return np.pi * R[:, 0, 0] / model.mu0


@pytest.mark.parametrize("case_i", range(6))
def test_6sv1_case(case_i):
    truth = np.load(DATA)[case_i]          # (3 sza, 3 az, 16 vza)
    szas, lam, tau, rho = CASES[case_i]
    worst = 0.0
    for i_s, sza in enumerate(szas):
        for i_a, az in enumerate(AZS):
            R = _run(sza, az, lam, tau, rho)
            rel = np.abs(truth[i_s, i_a] - R) / truth[i_s, i_a]
            worst = max(worst, rel.max())
    assert worst < 0.006, f"case {case_i + 1} max rel err {worst:.4f}"
