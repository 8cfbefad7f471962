"""Jacobian validation: rt_run_lin (jvp-through-solver + host tangents) vs
central finite differences of the full forward pipeline — the reference's
perturb_parameters strategy (src/Testing/perturb_parameters.jl,
test_forward_lin.jl)."""

import copy

import numpy as np
import pytest

from vsmartmom_tpu import model_from_parameters, rt_run
from vsmartmom_tpu.core.linearization import (AEROSOL_PARAMS,
                                              ParameterLayout,
                                              default_layout, rt_run_lin)
from vsmartmom_tpu.core.model import (Parameters, RTAerosol, ScatteringParams,
                                      SurfaceDescriptor)
from vsmartmom_tpu.scattering.stokes import STOKES_I, STOKES_IQU


def _params(albedo=0.2, wind=None, aerosol=True, analytic_phase=False):
    nu0 = 1e7 / 755.0
    if wind is not None:
        surf = SurfaceDescriptor("CoxMunkSurface", [], {"wind_speed": wind})
    else:
        surf = SurfaceDescriptor("LambertianSurfaceScalar", [albedo])
    aerosols = []
    if aerosol:
        if analytic_phase:
            aerosols = [RTAerosol(tau_ref=0.15, p0=700.0, sigma_p=60.0,
                                  phase_function_g=0.6, ssa=0.95)]
        else:
            aerosols = [RTAerosol(tau_ref=0.15, p0=700.0, sigma_p=60.0,
                                  mu_log=float(np.log(0.12)),
                                  sigma_log=float(np.log(1.5)),
                                  n_r=1.4, n_i=0.003)]
    return Parameters(
        spec_bands=[np.array([nu0, nu0 + 0.5])],
        surfaces=[surf],
        nstreams=4, polarization=STOKES_IQU,
        sza=40.0, vza=[10.0, 45.0], vaz=[30.0, 150.0], obs_alt=0.0,
        T=np.array([230.0, 260.0, 285.0]),
        p=np.array([10.0, 400.0, 800.0, 1013.0]),
        depol=0.0,
        scattering_params=ScatteringParams(rt_aerosols=aerosols,
                                           nquad_radius=300, r_max=10.0,
                                           lambda_ref=0.755) if aerosols else None)


def _fd_jacobian(params, perturb, h):
    """Central FD of R through the full pipeline."""
    p_hi = perturb(copy.deepcopy(params), +h)
    p_lo = perturb(copy.deepcopy(params), -h)
    R_hi, _ = rt_run(model_from_parameters(p_hi))
    R_lo, _ = rt_run(model_from_parameters(p_lo))
    return (R_hi - R_lo) / (2 * h)


def _check(dR_lin, dR_fd, rtol=2e-3):
    scale = max(np.abs(dR_fd).max(), 1e-12)
    err = np.abs(dR_lin - dR_fd).max() / scale
    assert err < rtol, f"Jacobian mismatch: {err:.2e} (scale {scale:.2e})"


class TestAerosolJacobians:
    @pytest.fixture(scope="class")
    def lin(self):
        params = _params()
        model = model_from_parameters(params)
        layout = default_layout(model)
        R, T, dR, dT = rt_run_lin(model, layout=layout)
        return params, layout, R, dR

    def test_layout(self, lin):
        _, layout, _, dR = lin
        assert layout.n_total == 8          # 7 aerosol + 1 albedo
        assert dR.shape[-1] == 8

    @pytest.mark.parametrize("ip,attr,h", [
        (0, "tau_ref", 1e-3), (5, "p0", 1.0), (6, "sigma_p", 0.5)])
    def test_linear_params_vs_fd(self, lin, ip, attr, h):
        params, layout, _, dR = lin

        def perturb(p, dh):
            a = p.scattering_params.rt_aerosols[0]
            setattr(a, attr, getattr(a, attr) + dh)
            return p
        dR_fd = _fd_jacobian(params, perturb, h)
        _check(dR[..., ip], dR_fd)

    @pytest.mark.parametrize("ip,attr,h", [
        (1, "n_r", 2e-3), (2, "n_i", 2e-4),
        (3, "mu_log", 2e-3), (4, "sigma_log", 2e-3)])
    def test_mie_params_vs_fd(self, lin, ip, attr, h):
        params, layout, _, dR = lin

        def perturb(p, dh):
            a = p.scattering_params.rt_aerosols[0]
            setattr(a, attr, getattr(a, attr) + dh)
            return p
        dR_fd = _fd_jacobian(params, perturb, h)
        _check(dR[..., ip], dR_fd, rtol=5e-3)

    def test_albedo_vs_fd(self, lin):
        params, layout, _, dR = lin

        def perturb(p, dh):
            p.surfaces[0].args[0] += dh
            return p
        dR_fd = _fd_jacobian(params, perturb, 1e-3)
        _check(dR[..., layout.surface_index()], dR_fd)


class TestWindJacobian:
    def test_wind_vs_fd(self):
        params = _params(wind=6.0, aerosol=False)
        model = model_from_parameters(params)
        layout = default_layout(model)
        assert layout.surface_params == ("wind_speed",)
        R, T, dR, dT = rt_run_lin(model, layout=layout)

        def perturb(p, dh):
            p.surfaces[0].kwargs["wind_speed"] += dh
            return p
        # Analytic sigma^2-chain tangent (round 4): the gate tightens from
        # 5e-3 (FD-vs-FD era) to 1e-5 — residual is FD truncation only.
        dR_fd = _fd_jacobian(params, perturb, 5e-3)
        _check(dR[..., layout.surface_index()], dR_fd, rtol=1e-5)

    def test_forward_consistency(self):
        """rt_run_lin's R (incl. TMS) must equal rt_run's R."""
        params = _params(wind=6.0, aerosol=False)
        model = model_from_parameters(params)
        R_fwd, _ = rt_run(model)
        R_lin, _, _, _ = rt_run_lin(model)
        assert np.allclose(R_fwd, R_lin, rtol=1e-12)


class TestGasJacobian:
    def test_vmr_scale_vs_fd(self, tmp_path):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_absorption import _synthetic_par
        from vsmartmom_tpu.core.model import AbsorptionParams
        par = str(tmp_path / "o2.par")
        _synthetic_par(par, [(7, 1, 13050.0 + 5 * k, 3e-25, 0.05, 0.05,
                              120.0, 0.7, -0.008) for k in range(5)])
        params = _params(aerosol=False)
        params.polarization = STOKES_I
        params.spec_bands = [np.arange(13049.0, 13071.0, 0.5)]
        params.absorption_params = AbsorptionParams(
            molecules=[["O2"]], vmr={"O2": 0.21}, par_paths={"O2": par})
        model = model_from_parameters(params)
        layout = default_layout(model)
        assert layout.gas_names == ("O2",)
        R, T, dR, dT = rt_run_lin(model, layout=layout)

        # FD in the VMR-scale parameter: vmr -> vmr * (1 + h)
        def perturb(p, dh):
            p.absorption_params.vmr["O2"] = 0.21 * (1 + dh)
            return p
        dR_fd = _fd_jacobian(params, perturb, 1e-3)
        _check(dR[..., layout.gas_index(0)], dR_fd, rtol=2e-3)


class TestFusedJvp:
    def test_fused_lin_matches_xla_lin(self):
        """rt_run_lin through the fused band kernel (pallas auto-JVP,
        interpret mode on CPU) must match the packed-XLA jvp path."""
        params = _params(wind=6.0, aerosol=False)
        m_x = model_from_parameters(params)
        R1, T1, dR1, dT1 = rt_run_lin(m_x)

        import copy as _copy
        params_f = _copy.deepcopy(params)
        params_f.fused = True
        params_f.pack = 2
        m_f = model_from_parameters(params_f)
        R2, T2, dR2, dT2 = rt_run_lin(m_f)
        np.testing.assert_allclose(R2, R1, rtol=5e-5, atol=1e-8)
        scale = np.abs(dR1).max()
        np.testing.assert_allclose(dR2, dR1, rtol=0, atol=1e-4 * scale)

    def test_multitangent_matches_jvp_loop(self):
        """The multitangent linearize-split kernel (ops/fused_lin.py:
        primal ladder once, P tangent replays per chunk) must match the
        per-parameter jvp path on the full aerosol+wind parameter stack
        (8 params -> exercises tangent chunking too)."""
        import copy as _copy
        import os

        params = _params(wind=6.0, aerosol=True)
        params = _copy.deepcopy(params)
        params.fused = True
        params.pack = 2
        m = model_from_parameters(params)

        os.environ["VSM_LIN_JVP"] = "1"
        try:
            R1, T1, dR1, dT1 = rt_run_lin(m)
        finally:
            del os.environ["VSM_LIN_JVP"]
        R2, T2, dR2, dT2 = rt_run_lin(m)
        np.testing.assert_allclose(R2, R1, rtol=1e-5, atol=1e-8)
        for a, b in ((dR2, dR1), (dT2, dT1)):
            scale = np.abs(b).max()
            np.testing.assert_allclose(a, b, rtol=0, atol=2e-4 * scale)
