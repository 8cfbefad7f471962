"""rt_run_ss (truncated-MOM single-scatter driver) tests.

Cross-validation strategy (reference rt_run.jl:574-755): for an untruncated
Rayleigh scene the MOM-quadrature SS result must match the exact analytic
single-scatter solver (StandaloneSS) — two independent formulations of the
same physics; and SS must approach the full multiple-scattering rt_run as
tau -> 0 while staying strictly below it for a conservative atmosphere.
"""

import numpy as np
import pytest

from vsmartmom_tpu import model_from_parameters
from vsmartmom_tpu.core.model import Parameters, SurfaceDescriptor
from vsmartmom_tpu.core.singlescatter import rt_run_ss
from vsmartmom_tpu.core.solver import rt_run
from vsmartmom_tpu.scattering.stokes import STOKES_I, STOKES_IQU


def _model(tau_tot=0.1, albedo=0.2, pol=STOKES_I, nstreams=10):
    params = Parameters(
        spec_bands=[np.array([1e7 / 500.0, 1e7 / 499.0])],
        surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [albedo])],
        nstreams=nstreams, polarization=pol,
        sza=45.0, vza=[15.0, 45.0], vaz=[30.0, 120.0], obs_alt=0.0,
        T=np.array([250.0, 270.0]), p=np.array([100.0, 600.0, 1013.0]),
        depol=0.0)
    model = model_from_parameters(params)
    model.bands[0].tau_rayl[:] = tau_tot / 2
    return model


class TestAgainstExactSS:
    @pytest.mark.parametrize("albedo", [0.0, 0.3])
    def test_matches_standalone_exact(self, albedo):
        """MOM-quadrature SS == analytic exact SS for untruncated Rayleigh
        (same physics, independent formulations; quadrature error only)."""
        from vsmartmom_tpu.standalone_ss import (ExactSSConfig,
                                                 LambertianSSSurface,
                                                 RayleighSSContributor,
                                                 SSGeometry, run_exact_ss)
        tau_tot = 0.3
        model = _model(tau_tot=tau_tot, albedo=albedo)
        out = rt_run_ss(model)

        geo = SSGeometry(mu0=np.cos(np.deg2rad(45.0)),
                         mu_v=np.cos(np.deg2rad([15.0, 45.0])),
                         dphi=np.deg2rad([30.0, 120.0]))
        cfg = ExactSSConfig(
            geometry=geo, surface=LambertianSSSurface(albedo),
            contributors=[RayleighSSContributor(
                tau=np.full((2, 2), tau_tot / 2), depol=0.0)])
        # rt_run_ss carries atmospheric SS + direct-beam surface reflection
        # only (interaction_ss.jl touches J vectors; the surface j0- seed is
        # the direct-beam reflection) = StandaloneSS paths 1 + 2.
        res = run_exact_ss(cfg, "paths_1_2")
        got = out["R"][:, 0, 0]
        want = res["total"][:, 0, 0]
        rel = np.abs(got - want) / np.abs(want)
        assert rel.max() < 5e-3, (got, want)

    def test_ss_below_full_and_thin_limit(self):
        """SS < full rt_run (MS adds radiance, conservative Rayleigh), and
        SS -> full as tau -> 0."""
        thick = _model(tau_tot=0.5, albedo=0.0)
        R_full, _ = rt_run(thick)
        R_ss = rt_run_ss(thick)["R"]
        assert np.all(R_ss[:, 0, :] < R_full[:, 0, :])

        # The SS deficit is the multiple-scattering fraction, O(tau) relative
        # (measured coefficient ~2.3 tau for Rayleigh): check the scaling.
        rels = []
        for tau_tot in (0.005, 0.0005):
            thin = _model(tau_tot=tau_tot, albedo=0.0)
            R_full_t, _ = rt_run(thin)
            R_ss_t = rt_run_ss(thin)["R"]
            rels.append(np.abs(R_ss_t[:, 0, :] - R_full_t[:, 0, :]).max()
                        / R_full_t[:, 0, :].max())
        assert rels[0] < 3 * 0.005 and rels[1] < 3 * 0.0005, rels
        # linear scaling in tau (not constant offset)
        assert rels[1] < rels[0] / 5


class TestHemisphericIntegrals:
    def test_energy_sanity(self):
        """hem_R + hem_T + absorbed + direct <= incident (conservative:
        close); both positive; hem_R grows with albedo."""
        m0 = _model(tau_tot=0.2, albedo=0.0)
        out0 = rt_run_ss(m0)
        assert np.all(out0["hem_R"] > 0) and np.all(out0["hem_T"] > 0)

        m1 = _model(tau_tot=0.2, albedo=0.5)
        out1 = rt_run_ss(m1)
        assert np.all(out1["hem_R"] > out0["hem_R"])

    def test_polarized_runs(self):
        model = _model(tau_tot=0.3, albedo=0.1, pol=STOKES_IQU)
        out = rt_run_ss(model)
        R = out["R"]
        assert R.shape == (2, 3, 2)
        assert np.all(np.isfinite(R))
        # |Q| <= I
        assert np.all(np.abs(R[:, 1, :]) <= R[:, 0, :])
