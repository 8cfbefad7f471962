"""Rotational Raman scattering (RRS) validation.

Truth sources (no Julia runtime available for frozen-snapshot parity):
1. Greek mixture identity: Rayleigh = pi_Cab * Cabannes + (1-pi_Cab) * Raman
   (the basis of the reference's elastic/inelastic split).
2. Flat-spectrum closure: with spectrally flat optics and F0, the
   first-order RRS transport must reconstruct the full-Rayleigh elastic
   solution exactly (away from band edges) — this exercises every inelastic
   kernel (elemental, doubling, interaction, postprocessing) end-to-end.
3. The Ring effect: a Fraunhofer-like line in F0 is filled in.
"""

import numpy as np
import pytest

from vsmartmom_tpu import model_from_parameters, rt_run
from vsmartmom_tpu.core.inelastic import rt_run_inelastic
from vsmartmom_tpu.core.model import Parameters, SurfaceDescriptor
from vsmartmom_tpu.inelastic.rrs_setup import (greek_raman,
                                               rrs_redistribution)
from vsmartmom_tpu.scattering.greek import greek_rayleigh
from vsmartmom_tpu.inelastic.molecular import air_depolarization
from vsmartmom_tpu.scattering.stokes import STOKES_I, STOKES_IQU

NU = np.arange(12950.0, 13200.0, 2.0)


def _model(pol=STOKES_I, albedo=0.0, vza=(0.0, 40.0), vaz=(0.0, 90.0)):
    params = Parameters(
        spec_bands=[NU],
        surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [albedo])],
        nstreams=4, polarization=pol,
        sza=45.0, vza=list(vza), vaz=list(vaz), obs_alt=0.0,
        T=np.array([250.0, 275.0]), p=np.array([100.0, 500.0, 1013.0]),
        depol=-1.0)
    model = model_from_parameters(params)
    model.bands[0].tau_rayl[:] = 0.15 / 2
    return model


class TestSetup:
    def test_redistribution_grid(self):
        shifts, w, pi_cab = rrs_redistribution(NU)
        assert len(shifts) > 50                  # O(100) lines hit the grid
        assert np.all(shifts != 0)               # elastic line excluded
        assert np.isclose(w.sum(), 1 - pi_cab, rtol=1e-12)
        assert 0.95 < pi_cab < 0.98
        # Stokes and anti-Stokes branches both present
        assert shifts.min() < 0 < shifts.max()

    def test_greek_mixture_identity(self):
        """Rayleigh Greek = pi_Cab * Cabannes + (1 - pi_Cab) * Raman."""
        d_ray, d_cab, pi_cab = air_depolarization(13075.0)
        gr, gc, gm = (greek_rayleigh(d_ray), greek_rayleigh(d_cab),
                      greek_raman())
        for f in ("alpha", "beta", "gamma", "delta"):
            mix = pi_cab * getattr(gc, f) + (1 - pi_cab) * getattr(gm, f)
            assert np.allclose(getattr(gr, f), mix, atol=2e-3), f


class TestFlatSpectrumClosure:
    @pytest.mark.parametrize("pol", [STOKES_I, STOKES_IQU])
    def test_cabannes_plus_rrs_equals_rayleigh(self, pol):
        model = _model(pol=pol)
        R, T, ieR, ieT = rt_run_inelastic(model)
        R_full, T_full = rt_run(model)
        shifts, _, _ = rrs_redistribution(NU)
        pad = int(np.abs(shifts).max())
        sl = slice(pad, len(NU) - pad)
        scale = np.abs(R_full[:, 0, sl]).max()
        relR = np.abs((R + ieR)[:, :, sl] - R_full[:, :, sl]).max() / scale
        relT = np.abs((T + ieT)[:, :, sl] - T_full[:, :, sl]).max() / scale
        assert relR < 1e-3, relR
        assert relT < 1e-3, relT

    def test_with_surface(self):
        model = _model(albedo=0.3)
        R, T, ieR, ieT = rt_run_inelastic(model)
        R_full, _ = rt_run(model)
        shifts, _, _ = rrs_redistribution(NU)
        pad = int(np.abs(shifts).max())
        sl = slice(pad, len(NU) - pad)
        rel = np.abs((R + ieR)[:, :, sl] - R_full[:, :, sl]).max() \
            / R_full[:, 0, sl].max()
        assert rel < 1e-3, rel

    def test_ie_magnitude(self):
        """Inelastic fraction of TOA radiance ~ (1 - pi_Cab) ~ 3-4%."""
        model = _model()
        R, _, ieR, _ = rt_run_inelastic(model)
        frac = ieR[0, 0, 60] / R[0, 0, 60]
        assert 0.02 < frac < 0.06, frac


class TestRingEffect:
    def test_fraunhofer_filling_in(self):
        model = _model(vza=(0.0,), vaz=(0.0,))
        f0 = 1.0 - 0.6 * np.exp(-(((NU - 13075.0) / 3.0) ** 2))
        model.bands[0].f0_spec = f0
        R, T, ieR, ieT = rt_run_inelastic(model)
        total = R[0, 0] + ieR[0, 0]
        i_c = int(np.argmin(f0))
        i_ref = i_c - 40
        depth_out = total[i_c] / total[i_ref]
        depth_in = f0[i_c] / f0[i_ref]
        assert depth_out > depth_in + 0.01       # line is filled in
        # elastic-only shows no filling-in
        depth_el = (R[0, 0, i_c] / R[0, 0, i_ref])
        assert abs(depth_el - depth_in) < 5e-3


class TestVibrationalRaman:
    """VS_0to1 / VS_1to0 (reference VS types, Inelastic/types.jl:48-99;
    kernel convention: incident wavelength = first grid point,
    elemental_inelastic.jl:279-294)."""

    def _vs_model(self, nu_grid, pol=STOKES_I):
        params = Parameters(
            spec_bands=[nu_grid],
            surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [0.0])],
            nstreams=4, polarization=pol,
            sza=45.0, vza=[0.0, 40.0], vaz=[0.0, 90.0], obs_alt=0.0,
            T=np.array([250.0, 275.0]), p=np.array([100.0, 500.0, 1013.0]),
            depol=-1.0)
        model = model_from_parameters(params)
        model.bands[0].tau_rayl[:] = 0.15 / 2
        return model

    def test_setup_weights(self):
        from vsmartmom_tpu.inelastic.vs_setup import (vs_band_grid,
                                                      vs_redistribution)
        grid = vs_band_grid(25000.0, half_width=120.0, dnu=0.5,
                            mode="VS_0to1")
        # recenter on the N2 Q branch so both molecules' structure is seen
        w, pi_cab, k = vs_redistribution(grid, "VS_0to1")
        assert w[0] == 0.0                       # incident point excluded
        assert np.any(w > 0)
        assert w.sum() < 1e-2                    # VS is a ~1e-3..1e-4 effect
        assert 0.99 < pi_cab < 1.0
        assert 0.5 < k < 1.0                     # red-shifted band
        # 1->0 anti-Stokes is Boltzmann-suppressed at 300 K
        grid1 = vs_band_grid(25000.0, half_width=120.0, dnu=0.5,
                             mode="VS_1to0")
        w1, _, _ = vs_redistribution(grid1, "VS_1to0")
        assert w1.sum() < 1e-2 * w.sum()

    def test_vs_equals_rrs_single_shift(self):
        """With spectrally flat optics, VS transport with weight only at
        target t must equal the (verified) RRS transport run with the single
        shift -t, compared at t: both describe one inelastic coupling from
        grid point 0 to t with identical dtau/F0 mixes."""
        import jax.numpy as jnp

        from vsmartmom_tpu.core.inelastic import (_roll0, _src_fixed0,
                                                  rt_solve_rrs)
        from vsmartmom_tpu.inelastic.rrs_setup import greek_raman
        from vsmartmom_tpu.scattering.zmatrix import compute_Z_moments

        nu = np.arange(13000.0, 13030.0, 2.0)
        model = self._vs_model(nu)
        inputs, config = model.build_band(0, rrs=True)
        band = model.bands[0]

        t = 9
        w0 = 0.01
        gk = greek_raman()
        n_m, N = config.m_max + 1, config.N
        Z_pp = np.zeros((n_m, N, N))
        Z_mp = np.zeros((n_m, N, N))
        for m in range(n_m):
            Z_pp[m], Z_mp[m] = compute_Z_moments(
                model.params.polarization, model.quad.qp_mu, gk, m)
        fscatt = np.ones((band.tau_rayl.shape[1], len(nu)))

        w_vec = np.zeros(len(nu)); w_vec[t] = w0
        out_vs = rt_solve_rrs(inputs, config, (0,),
                              jnp.asarray(w_vec[None, :]), jnp.asarray(Z_pp),
                              jnp.asarray(Z_mp), jnp.asarray(fscatt),
                              src_fn=_src_fixed0)
        out_rrs = rt_solve_rrs(inputs, config, (-t,),
                               jnp.asarray(np.array([w0])), jnp.asarray(Z_pp),
                               jnp.asarray(Z_mp), jnp.asarray(fscatt),
                               src_fn=_roll0)
        np.testing.assert_allclose(np.asarray(out_vs["ieR"])[:, :, t],
                                   np.asarray(out_rrs["ieR"])[:, :, t],
                                   rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(np.asarray(out_vs["ieT"])[:, :, t],
                                   np.asarray(out_rrs["ieT"])[:, :, t],
                                   rtol=1e-10, atol=1e-14)
        # away from t the VS field is exactly zero
        mask = np.ones(len(nu), bool); mask[t] = False
        assert np.abs(np.asarray(out_vs["ieR"])[:, :, mask]).max() == 0.0

    def test_vs_forward_run(self):
        from vsmartmom_tpu.inelastic.vs_setup import (vs_band_grid,
                                                      vs_redistribution)
        grid = vs_band_grid(25000.0, half_width=100.0, dnu=1.0,
                            mode="VS_0to1")
        model = self._vs_model(grid)
        R, T, ieR, ieT = rt_run_inelastic(model, mode="VS_0to1")
        w, _, _ = vs_redistribution(grid, "VS_0to1")
        assert ieR[0, 0, 0] == 0.0               # nothing at incident point
        assert np.all(ieR[:, 0, w > 0] > 0)      # scattered band filled
        # magnitude: ieR/R ~ w per target within an order of magnitude
        ratio = ieR[0, 0, w > 0] / R[0, 0, w > 0]
        wz = w[w > 0]
        assert np.all(ratio < 50 * wz) and np.all(ratio > wz / 50)
