"""Exact linearized Mie (scattering/mie_lin.py) vs tight central FD.

The reference differentiates Mie with ForwardDiff duals
(compute_NAI2_lin.jl); here the exact jacfwd through the JAX-traced NAI-2
pipeline must agree with a small-step central difference of the NumPy
pipeline — same physics, independent implementations AND independent
differentiation method (VERDICT round-1 item 7: quantify the tangent error
against the rtol 1e-5 Jacobian gate).
"""

from dataclasses import replace as dc_replace

import numpy as np
import pytest

from vsmartmom_tpu.core.model import RTAerosol, ScatteringParams
from vsmartmom_tpu.scattering.mie_lin import exact_aerosol_mie_tangents


def _fd_component(aer, scat, lam_band, shape, use_bge, l_cap, attr, h):
    """Central FD of the NumPy _build_one_aerosol-equivalent output."""
    from vsmartmom_tpu.scattering.mie import (
        Aerosol, SizeDistribution, compute_aerosol_optical_properties,
        compute_ref_aerosol_extinction, truncate_phase_delta_bge,
        truncate_phase_none)

    def build(a):
        mie_aero = Aerosol(SizeDistribution(a.mu_log, a.sigma_log),
                           a.n_r, a.n_i)
        n_ref = scat.n_ref if scat.n_ref is not None else \
            complex(a.n_r, -a.n_i)
        ref_aero = Aerosol(mie_aero.size_distribution, n_ref.real,
                           -n_ref.imag)
        k_ref = compute_ref_aerosol_extinction(ref_aero, scat.lambda_ref,
                                               scat.r_max, scat.nquad_radius)
        raw = compute_aerosol_optical_properties(mie_aero, lam_band,
                                                 scat.r_max,
                                                 scat.nquad_radius)
        if use_bge and raw.greek_coefs.l_max > l_cap:
            optics = truncate_phase_delta_bge(raw, l_cap)
        else:
            optics = truncate_phase_none(raw)
        tau_prof = a.tau_ref * (raw.k / k_ref) * shape
        ft, w = optics.f_trunc, optics.ssa
        return {
            "tau_profile": (1.0 - ft * w) * tau_prof,
            "ssa": (1.0 - ft) * w / (1.0 - ft * w),
            "beta": np.asarray(optics.greek_coefs.beta),
            "gamma": np.asarray(optics.greek_coefs.gamma),
        }

    x = getattr(aer, attr)
    hi = build(dc_replace(aer, **{attr: x + h}))
    lo = build(dc_replace(aer, **{attr: x - h}))
    return {k: (hi[k] - lo[k]) / (2 * h) for k in hi}


@pytest.fixture(scope="module")
def setup():
    aer = RTAerosol(tau_ref=0.2, p0=800.0, sigma_p=50.0,
                    mu_log=np.log(0.3), sigma_log=np.log(1.8),
                    n_r=1.45, n_i=0.003)
    scat = ScatteringParams(rt_aerosols=[aer], r_max=10.0, nquad_radius=60,
                            lambda_ref=0.55)
    shape = np.array([0.1, 0.5, 0.4])
    return aer, scat, shape


@pytest.mark.parametrize("use_bge,l_cap", [(False, 0), (True, 20)])
def test_exact_matches_fd(setup, use_bge, l_cap):
    aer, scat, shape = setup
    lam = 0.765
    primal, jac = exact_aerosol_mie_tangents(aer, scat, lam, shape,
                                             use_bge, l_cap)
    attrs = {"n_r": (0, 1e-6), "n_i": (1, 1e-7), "mu_log": (2, 1e-6),
             "sigma_log": (3, 1e-6)}
    for attr, (ip, h) in attrs.items():
        fd = _fd_component(aer, scat, lam, shape, use_bge, l_cap, attr, h)
        # tau_profile tangent
        got = jac["tau_profile"][:, ip]
        ref = fd["tau_profile"]
        scale = max(np.abs(ref).max(), np.abs(primal["tau_profile"]).max())
        assert np.abs(got - ref).max() / scale < 1e-5, attr
        # ssa tangent
        got_s = jac["ssa"][ip]
        assert abs(got_s - fd["ssa"]) < 1e-5 * max(1.0, abs(fd["ssa"])), attr
        # greek beta / gamma tangents (row 1 = beta, row 2 = gamma)
        for row, key in ((1, "beta"), (2, "gamma")):
            got_g = jac["greek"][row, :, ip]
            ref_g = fd[key]
            L = min(len(got_g), len(ref_g))
            sc = max(np.abs(ref_g).max(), 1.0)
            assert np.abs(got_g[:L] - ref_g[:L]).max() / sc < 1e-4, (attr, key)


def test_primal_matches_numpy(setup):
    """The traced pipeline must reproduce the NumPy pipeline bit-closely."""
    aer, scat, shape = setup
    from vsmartmom_tpu.scattering.mie import (
        Aerosol, SizeDistribution, compute_aerosol_optical_properties)
    primal, _ = exact_aerosol_mie_tangents(aer, scat, 0.765, shape,
                                           False, 0)
    raw = compute_aerosol_optical_properties(
        Aerosol(SizeDistribution(aer.mu_log, aer.sigma_log), aer.n_r,
                aer.n_i), 0.765, scat.r_max, scat.nquad_radius)
    np.testing.assert_allclose(primal["ssa"], raw.ssa, rtol=1e-12)
    np.testing.assert_allclose(primal["greek"][1], raw.greek_coefs.beta,
                               rtol=0, atol=1e-10)
