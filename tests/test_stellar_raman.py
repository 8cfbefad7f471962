"""Stellar (H2) Raman scattering: sol_RRS and sol_VS_* modes.

Truth sources:
1. H2 molecular constants: rotational line spacing ~4(2J-1)B0 with
   B_e = 60.853 cm^-1 (the S(1)/O(3) lines near +-350-600 cm^-1 are the
   textbook H2 rotational Raman spectrum); depolarization limits.
2. Weight bookkeeping: sum of redistribution weights = 1 - pi_Cabannes.
3. The stellar Ring effect: a Fraunhofer-like dip in the stellar F0 is
   filled in by rotational Raman redistribution (reference behavior of
   rt_run with sol_RRS, stellar_types.jl F0 field).
4. sol_VS ``_plus`` concatenated grid: ie radiance lands ONLY on the
   shifted output band (never on the incident point), appears at the
   vibrational shift ~4160 cm^-1 (v=0->1 Q branch of H2).
"""

import numpy as np
import pytest

from vsmartmom_tpu import model_from_parameters
from vsmartmom_tpu.core.model import Parameters, SurfaceDescriptor
from vsmartmom_tpu.inelastic.stellar import (get_raman_solar_constants,
                                             greek_raman_stellar,
                                             greek_raman_stellar_vs,
                                             rho_depol_rayleigh,
                                             rt_run_stellar,
                                             sol_rrs_redistribution,
                                             sol_vs_plus_grid,
                                             sol_vs_redistribution)
from vsmartmom_tpu.scattering.stokes import STOKES_I

NU = np.arange(18000.0, 19600.0, 8.0)    # ~ 540 nm band, spans H2 shifts


def _model(nu_grid, f0_spec=None, tau_scat=0.3):
    params = Parameters(
        spec_bands=[np.asarray(nu_grid, dtype=np.float64)],
        surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [0.0])],
        nstreams=4, polarization=STOKES_I,
        sza=30.0, vza=[0.0, 40.0], vaz=[0.0, 0.0], obs_alt=0.0,
        T=np.array([200.0, 300.0]), p=np.array([100.0, 500.0, 1013.0]),
        depol=0.02)            # H2 Rayleigh depol (see test_depol below)
    model = model_from_parameters(params)
    # Scattering-only H2 column (tau_rayl repurposed as the H2 Rayleigh
    # profile; the redistribution physics is what is under test).
    model.bands[0].tau_rayl[:] = tau_scat / model.bands[0].tau_rayl.shape[1]
    if f0_spec is not None:
        model.bands[0].f0_spec = np.asarray(f0_spec)
    return model


class TestH2Constants:
    def test_rotational_line_positions(self):
        h2 = get_raman_solar_constants(18500.0)
        # Stokes S-branch J -> J+2: |shift| = (4J+6)B - O(D); J=0 line at
        # ~6 B0 ~ 354 cm^-1 (B0 = B_e - alpha_e/2 ~ 59.3)
        s0 = -h2.dnu_RR_Jp2[0]
        assert 350.0 < s0 < 360.0
        # anti-Stokes J=2 -> 0 mirrors it
        assert np.isclose(h2.dnu_RR_Jm2[2], s0, rtol=1e-6)
        # vibrational Q(1) shift ~ 4155 cm^-1
        q1 = -h2.dnu_VR_0to1[1]
        assert 4100.0 < q1 < 4200.0

    def test_depol_limits(self):
        h2 = get_raman_solar_constants(18500.0)
        d = rho_depol_rayleigh(h2)
        assert 0.005 < d < 0.05          # H2 Rayleigh depol ~ 0.02
        # rotational Raman Greek fixed at depol 6/7
        gk = greek_raman_stellar()
        assert np.isclose(gk.beta[0], 1.0)
        gv = greek_raman_stellar_vs(h2)
        assert gv.beta[2] > gk.beta[2]   # Q branch far more polarized
        assert gv.beta[2] < 0.5          # but below pure-Rayleigh depol=0


class TestSolRRS:
    def test_redistribution(self):
        shifts, w, pi_cab = sol_rrs_redistribution(NU)
        assert len(shifts) >= 6          # S/O branches of populated J
        assert np.all(shifts != 0)
        assert shifts.min() < 0 < shifts.max()
        assert np.isclose(w.sum(), 1.0 - pi_cab, rtol=1e-12)
        assert 0.90 < pi_cab < 0.999
        # H2's huge rotational spacing: nearest line >= 300 cm^-1 away
        dnu = NU[1] - NU[0]
        assert np.min(np.abs(shifts)) * dnu > 300.0

    def test_ring_effect(self):
        """A Fraunhofer-like dip in stellar F0 is filled in by RRS."""
        f0 = np.ones_like(NU)
        i_line = len(NU) // 2
        width = (NU - NU[i_line]) / 12.0
        f0 = f0 - 0.7 * np.exp(-width ** 2)          # 70% deep line
        model = _model(NU, f0_spec=f0)
        R, T, ieR, ieT = rt_run_stellar(model, mode="sol_RRS")
        tot = R + ieR
        # Filling-in: ie contribution relative to the elastic radiance is
        # largest in the line core (neighbors pump the dark wavelength).
        interior = slice(40, len(NU) - 40)
        ratio = (ieR[0, 0] / np.where(R[0, 0] > 0, R[0, 0], 1.0))[interior]
        i_core = i_line - interior.start
        assert ratio[i_core] > 2.0 * np.median(ratio)
        assert np.all(np.isfinite(tot))
        assert np.all(ieR[:, 0, interior] >= 0)

    def test_flat_closure_scale(self):
        """Flat F0: ie radiance is a small elastic-like correction with
        magnitude ~ (1 - pi_cab) x R away from band edges."""
        model = _model(NU)
        R, T, ieR, ieT = rt_run_stellar(model, mode="sol_RRS")
        _, w, pi_cab = sol_rrs_redistribution(NU)
        interior = slice(80, len(NU) - 80)
        frac = np.abs(ieR[0, 0, interior]).max() / R[0, 0, interior].max()
        assert frac < 3.0 * (1.0 - pi_cab)
        assert frac > 0.0


class TestSolVS:
    def test_plus_grid_layout(self):
        grid = sol_vs_plus_grid(540.0, "sol_VS_0to1", dnu=4.0)
        nu_inc = 1e7 / 540.0
        assert np.isclose(grid[0], nu_inc)
        # output band sits ~4160 cm^-1 BELOW the incident (Stokes 0->1)
        assert grid[1:].max() < nu_inc - 2000.0
        # covers O- and S-branch rovibrational shifts around the Q branch
        assert grid[1:].min() < nu_inc - 4500.0
        # the Q-branch shift (~ -4160 cm^-1) lies inside the band
        assert grid[1:].min() < nu_inc - 4160.0 < grid[1:].max()

    def test_vs_redistribution_channels(self):
        grid = sol_vs_plus_grid(540.0, "sol_VS_0to1", dnu=4.0)
        w_rvrs, w_vrs, pi_cab_vs, k = sol_vs_redistribution(
            grid, "sol_VS_0to1")
        assert w_rvrs[0] == 0.0 and w_vrs[0] == 0.0
        assert np.any(w_rvrs > 0) and np.any(w_vrs > 0)
        # Q branch dominates the O/S branches for H2
        assert w_vrs.sum() > w_rvrs.sum()
        assert 0.9 < pi_cab_vs < 1.0
        # scattered wavelength is redder -> Rayleigh cross section smaller
        assert k < 1.0

    def test_vs_forward(self):
        grid = sol_vs_plus_grid(540.0, "sol_VS_0to1", dnu=8.0)
        model = _model(grid)
        R, T, ieR, ieT = rt_run_stellar(model, mode="sol_VS_0to1")
        # incident point receives no inelastic radiance; band does
        assert abs(ieR[0, 0, 0]) < 1e-12
        assert ieR[0, 0, 1:].max() > 0
        assert np.all(np.isfinite(ieR))
        w_rvrs, w_vrs, _, _ = sol_vs_redistribution(grid, "sol_VS_0to1")
        # ie radiance appears exactly where Raman weight lands
        hit = (w_rvrs + w_vrs) > 0
        assert ieR[0, 0, 1:][hit[1:]].max() > 10.0 * max(
            ieR[0, 0, 1:][~hit[1:]].max(), 1e-30)
