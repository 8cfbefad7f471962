"""Canopy surface tests (reference test/test_canopy.jl).

Covers the bi-Lambertian spherical-LAD phase expansion, Z-matrix flux
normalization, the LAI -> 0 soil limit, energy conservation with
non-absorbing leaves + unit soil, spectral leaf optics, clumping, and YAML
parsing of the canopy section.
"""

import numpy as np
import pytest

from vsmartmom_tpu.core.model import (Parameters, SurfaceDescriptor,
                                      model_from_parameters)
from vsmartmom_tpu.core.solver import rt_run, rt_run_full
from vsmartmom_tpu.io.yaml_input import parameters_from_dict
from vsmartmom_tpu.scattering.stokes import polarization_from_name
from vsmartmom_tpu.scattering.zmatrix import compute_Z_moments
from vsmartmom_tpu.surfaces.canopy import (CanopySurface, bilambertian_greek,
                                           bilambertian_phase)
from vsmartmom_tpu.utils.quadrature import gauleg

T33 = np.linspace(244.0, 285.0, 33)
P34 = np.logspace(np.log10(0.14), np.log10(980.0), 34)


def _run(surface, n_spec=2, pol="Stokes_I", nstreams=6):
    params = Parameters(
        spec_bands=[19417.0 + np.arange(n_spec, dtype=np.float64)],
        surfaces=[surface], nstreams=nstreams,
        polarization=polarization_from_name(pol),
        sza=30.0, vza=[0.0, 30.0, 60.0], vaz=[0.0, 0.0, 0.0],
        obs_alt=1000.0, T=T33, p=P34, profile_reduction=5,
        depol=-1.0, float_type=np.float64)
    return model_from_parameters(params)


def _canopy_desc(**kw):
    soil = kw.pop("soil", SurfaceDescriptor("LambertianSurfaceScalar", [0.10]))
    return SurfaceDescriptor(
        "CanopySurface", [], {"_surface_obj": CanopySurface(soil=soil, **kw)})


class TestBilambertianPhase:
    def test_normalization(self):
        """(1/2) Integral p(mu) dmu = 1 (Greek beta_0 = 1)."""
        for rho, tau in [(0.4, 0.05), (0.5, 0.5), (0.1, 0.0), (0.0, 0.3)]:
            gk = bilambertian_greek(rho, tau, 32)
            assert gk.beta[0] == pytest.approx(1.0, abs=1e-10)

    def test_phase_nonnegative(self):
        mu = np.linspace(-1, 1, 201)
        p = bilambertian_phase(mu, 0.4, 0.05)
        assert np.all(p >= -1e-12)

    def test_symmetric_leaf_zero_asymmetry(self):
        """rho == tau -> the cos(beta) terms cancel -> g = beta_1/3 = 0."""
        gk = bilambertian_greek(0.3, 0.3, 16)
        assert abs(gk.beta[1]) < 1e-12

    def test_pure_reflector_backscatter(self):
        """tau = 0: no forward scattering (p(beta=0) = 0)."""
        assert bilambertian_phase(np.array([1.0]), 0.5, 0.0)[0] == \
            pytest.approx(0.0, abs=1e-12)

    def test_z_flux_normalization(self):
        """Sum_i w_i (Zpp + Zmp)[i, j] at m = 0 ~ 2 (energy conservation in
        the adding-doubling convention; reference test_canopy.jl:75-77)."""
        pol = polarization_from_name("Stokes_I")
        mu, w = gauleg(8)
        gk = bilambertian_greek(0.5, 0.5, 48)
        Zpp, Zmp = compute_Z_moments(pol, mu, gk, 0)
        flux = np.array([np.sum(w * (Zpp[:, j] + Zmp[:, j]))
                         for j in range(len(mu))])
        np.testing.assert_allclose(flux, 2.0, rtol=3e-3, atol=3e-3)


class TestCanopyRT:
    def test_lai_zero_is_soil(self):
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.10])
        R_soil, T_soil, *_ = rt_run(_run(soil))
        R_c, T_c, *_ = rt_run(_run(_canopy_desc(soil=soil, LAI=1e-9)))
        np.testing.assert_allclose(R_c, R_soil, rtol=1e-7)
        np.testing.assert_allclose(T_c, T_soil, rtol=1e-7)

    def test_bright_canopy_over_dark_soil_brightens(self):
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.05])
        R_soil, *_ = rt_run(_run(soil))
        R_c, *_ = rt_run(_run(_canopy_desc(
            soil=soil, LAI=4.0, leaf_reflectance=0.45,
            leaf_transmittance=0.45)))
        assert np.all(R_c > R_soil)
        assert np.all(np.isfinite(R_c)) and np.all(R_c > 0)

    def test_dark_canopy_over_bright_soil_darkens(self):
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.60])
        R_soil, *_ = rt_run(_run(soil))
        R_c, *_ = rt_run(_run(_canopy_desc(
            soil=soil, LAI=4.0, leaf_reflectance=0.05,
            leaf_transmittance=0.01)))
        assert np.all(R_c < R_soil)

    def test_energy_conservation_white_canopy(self):
        """Non-absorbing leaves (omega = 1) over unit-albedo soil: the
        conservative surface returns all BOA-incident energy, so the
        upwelling BOA flux equals the total (direct + diffuse) downwelling
        BOA flux. (It does NOT equal mu0: with a reflecting surface under a
        scattering atmosphere, photons cross the BOA plane multiple times.)
        """
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [1.0])
        model = _run(_canopy_desc(soil=soil, LAI=3.0,
                                  leaf_reflectance=0.5,
                                  leaf_transmittance=0.5))
        out = rt_run_full(model)
        np.testing.assert_allclose(out["bhr_uw"], out["bhr_dw"], rtol=2e-3)
        mu0 = model.quad.qp_mu[model.quad.i_mu0]
        assert np.all(out["bhr_uw"] > mu0)   # multiple-crossing enhancement

    def test_clumping_reduces_effective_lai(self):
        """Omega < 1 -> less projected leaf area -> closer to the soil."""
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.60])
        R_soil, *_ = rt_run(_run(soil))
        kw = dict(soil=soil, LAI=2.0, leaf_reflectance=0.05,
                  leaf_transmittance=0.01)
        R_full, *_ = rt_run(_run(_canopy_desc(clumping_omega=1.0, **kw)))
        R_clump, *_ = rt_run(_run(_canopy_desc(clumping_omega=0.5, **kw)))
        assert np.all(np.abs(R_clump - R_soil) < np.abs(R_full - R_soil))

    def test_n_layers_consistent(self):
        """A homogeneous canopy split into sublayers must match 1 layer."""
        kw = dict(LAI=2.0, leaf_reflectance=0.4, leaf_transmittance=0.05)
        R1, *_ = rt_run(_run(_canopy_desc(n_layers=1, **kw)))
        R4, *_ = rt_run(_run(_canopy_desc(n_layers=4, **kw)))
        np.testing.assert_allclose(R4, R1, rtol=1e-6)

    def test_polarized_run(self):
        """IQU canopy run: finite, |Q| < I, canopy scattering depolarizes
        relative to bare Rayleigh+soil."""
        desc = _canopy_desc(LAI=3.0)
        R, *_ = rt_run(_run(desc, pol="Stokes_IQU"))
        assert np.all(np.isfinite(R))
        assert np.all(np.abs(R[:, 1, :]) < R[:, 0, :])

    def test_spectral_leaf_optics(self):
        """Leaf R/T on a wavelength grid (red-edge-like step): reflectance
        ordering follows the leaf optics across the band."""
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.10])
        lo_nu, hi_nu = 19417.0, 19427.0
        # leaf grid in nm spanning the band (~515 nm)
        lam = np.array([1e7 / hi_nu - 0.1, 1e7 / lo_nu + 0.1])
        desc = SurfaceDescriptor("CanopySurface", [], {"_surface_obj":
            CanopySurface(soil=soil, LAI=4.0,
                          leaf_reflectance=np.array([0.45, 0.05]),
                          leaf_transmittance=np.array([0.45, 0.05]),
                          leaf_optics_grid=lam, grid_unit="nm")})
        params = Parameters(
            spec_bands=[np.linspace(lo_nu, hi_nu, 5)],
            surfaces=[desc], nstreams=6,
            polarization=polarization_from_name("Stokes_I"),
            sza=30.0, vza=[0.0], vaz=[0.0], obs_alt=1000.0,
            T=T33, p=P34, profile_reduction=5, depol=-1.0,
            float_type=np.float64)
        R, *_ = rt_run(model_from_parameters(params))
        spec = R[0, 0, :]
        assert np.all(np.isfinite(spec))
        # lam decreasing in nu -> bright leaf at hi_nu end, dark at lo_nu:
        # note grid in nm maps hi_nu->small lam. Bright (0.45) sits at
        # lam[0] ~ hi_nu, so R should increase across the band.
        assert spec[-1] > spec[0]
        assert spec[-1] - spec[0] > 0.005


class TestCanopyYaml:
    def test_canopy_section(self):
        d = {
            "radiative_transfer": {
                "spec_bands": ["[19417.0 19418.0]"],
                "surface": ["LambertianSurfaceScalar(0.10)"],
                "polarization_type": "Stokes_I()",
                "nstreams": 6, "depol": -1, "float_type": "Float64",
            },
            "canopy": {
                "LAI": 3.0, "n_layers": 1, "leaf_reflectance": 0.4,
                "leaf_transmittance": 0.05, "soil": "from_surface",
                "clumping": {"type": "constant", "Omega": 0.8},
            },
            "geometry": {"sza": 30, "vza": [0, 30, 60], "vaz": [0, 0, 0],
                         "obs_alt": 1000.0},
            "atmospheric_profile": {"T": T33.tolist(), "p": P34.tolist(),
                                    "profile_reduction": 5},
        }
        params = parameters_from_dict(d)
        surf = params.surfaces[0]
        assert surf.kind == "CanopySurface"
        canopy = surf.kwargs["_surface_obj"]
        assert canopy.LAI == 3.0
        assert canopy.clumping_omega == 0.8
        assert canopy.soil.kind == "LambertianSurfaceScalar"
        R, *_ = rt_run(model_from_parameters(params))
        assert np.all(np.isfinite(R)) and np.all(R > 0)


class TestLeafAngleDistributions:
    """Non-spherical LADs (reference CanopyOptics G/Gamma numerics,
    re-derived — see surfaces/canopy.py module docstring)."""

    def test_G_direction_average_is_half(self):
        """For ANY normalized LAD, int_0^1 G(mu) dmu = 1/2 (the average
        projection of a flat plate over all directions)."""
        from vsmartmom_tpu.surfaces.canopy import LAD_FAMILIES, project_G
        x, w = np.polynomial.legendre.leggauss(64)
        mu = 0.5 * (x + 1.0)
        for lad in LAD_FAMILIES:
            G = project_G(mu, lad)
            assert np.sum(0.5 * w * G) == pytest.approx(0.5, abs=2e-3), lad

    def test_G_orderings(self):
        """Horizontal leaves project most at nadir; vertical at grazing."""
        from vsmartmom_tpu.surfaces.canopy import project_G
        g1 = {lad: project_G(np.array([1.0]), lad)[0]
              for lad in ("planophile", "spherical", "erectophile")}
        assert g1["planophile"] > g1["spherical"] > g1["erectophile"]
        g0 = {lad: project_G(np.array([0.05]), lad)[0]
              for lad in ("planophile", "spherical", "erectophile")}
        assert g0["erectophile"] > g0["planophile"]

    def test_spherical_numerical_Z_matches_greek(self):
        """The numerical Gamma -> Z projection reproduces the analytic
        Greek/Legendre pipeline in the spherical limit (pins both the
        Gamma normalization 4/(w_L G) and the (2 - delta_m0) Fourier
        convention)."""
        from vsmartmom_tpu.scattering.stokes import STOKES_I
        from vsmartmom_tpu.surfaces.canopy import lad_phase_fourier
        rho, tau = 0.35, 0.15
        qp = np.array([0.18, 0.45, 0.72, 0.95])
        Zpp_n, Zmp_n = lad_phase_fourier("spherical", rho, tau, qp, 3,
                                         n_tl=64, n_pl=128, n_dphi=128)
        gk = bilambertian_greek(rho, tau, 16)
        for m in range(3):
            Zpp_g, Zmp_g = compute_Z_moments(STOKES_I, qp, gk, m)
            np.testing.assert_allclose(Zpp_n[m], Zpp_g, atol=3e-4)
            np.testing.assert_allclose(Zmp_n[m], Zmp_g, atol=3e-4)

    def test_nonspherical_scene_runs_and_differs(self):
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.05])
        kw = dict(soil=soil, LAI=3.0, leaf_reflectance=0.45,
                  leaf_transmittance=0.45)
        R_sph, *_ = rt_run(_run(_canopy_desc(lad="spherical", **kw)))
        R_pla, *_ = rt_run(_run(_canopy_desc(lad="planophile", **kw)))
        R_ere, *_ = rt_run(_run(_canopy_desc(lad="erectophile", **kw)))
        for R in (R_pla, R_ere):
            assert np.all(np.isfinite(R)) and np.all(R > 0)
        # planophile (horizontal leaves) intercepts/returns more near-nadir
        # sunlight than erectophile for the same LAI
        assert R_pla[0, 0, 0] > R_ere[0, 0, 0]
        assert abs(R_pla[0, 0, 0] - R_sph[0, 0, 0]) > 1e-4

    def test_nonspherical_energy_conservation(self):
        """Conservative leaves + unit soil stay conservative through the
        directional elemental (bhr_uw == bhr_dw)."""
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [1.0])
        model = _run(_canopy_desc(soil=soil, LAI=2.0, lad="planophile",
                                  leaf_reflectance=0.5,
                                  leaf_transmittance=0.5))
        out = rt_run_full(model)
        np.testing.assert_allclose(out["bhr_uw"], out["bhr_dw"], rtol=5e-3)

    def test_directional_elemental_spherical_limit(self):
        """_elemental_directional with G = 1/2 reproduces kernels.elemental
        exactly (same slab, same sources)."""
        import jax.numpy as jnp
        from vsmartmom_tpu.core.kernels import elemental
        from vsmartmom_tpu.surfaces.canopy import _elemental_directional
        qp = np.array([0.2, 0.5, 0.5000000001, 0.9])
        wt = np.array([0.3, 0.4, 0.0, 0.3])
        G_N = np.full(4, 0.5)
        mu0 = qp[1]
        L = 0.8
        rng = np.random.default_rng(0)
        wZ = rng.uniform(0.1, 1.0, (2, 4, 4))
        F0 = np.zeros((1, 2))
        F0[0, :] = 1.0
        r_d, t_d, jp_d, jm_d = _elemental_directional(
            wZ, wZ[::-1], L, np.ones(2), qp, wt, G_N, mu0, 0.5, 1, 1,
            F0, 0.25)
        r_e, t_e, jp_e, jm_e = elemental(
            jnp.asarray(wZ), jnp.asarray(wZ[::-1]),
            jnp.full(2, 0.5 * L), jnp.zeros(2), jnp.asarray(qp),
            jnp.asarray(wt), mu0, 1, 1, jnp.asarray(F0), 0.25)
        np.testing.assert_allclose(r_d, np.asarray(r_e), rtol=1e-10)
        np.testing.assert_allclose(t_d, np.asarray(t_e), rtol=1e-9)
        np.testing.assert_allclose(jp_d, np.asarray(jp_e), rtol=1e-8)
        np.testing.assert_allclose(jm_d, np.asarray(jm_e), rtol=1e-10)


class TestCanopyHeterogeneity:
    def test_lai_fractions_homogeneous_invariance(self):
        """A homogeneous canopy is insensitive to how its LAI is split
        across sublayers — uneven lai_fractions must match the uniform
        split."""
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.10])
        kw = dict(soil=soil, LAI=3.0, leaf_reflectance=0.4,
                  leaf_transmittance=0.05)
        R_u, *_ = rt_run(_run(_canopy_desc(n_layers=4, **kw)))
        R_f, *_ = rt_run(_run(_canopy_desc(
            n_layers=4, lai_fractions=(0.4, 0.3, 0.2, 0.1), **kw)))
        # tolerance: the O(dtau_max) elemental-composition error differs
        # slightly between sublayer splits (canopy.py dtau_max note)
        np.testing.assert_allclose(R_f, R_u, rtol=1e-4)

    def test_lai_fractions_sum_preserved(self):
        """fractions summing to 1 reproduce the single-layer canopy."""
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.10])
        kw = dict(soil=soil, LAI=2.0, leaf_reflectance=0.3,
                  leaf_transmittance=0.1)
        R_1, *_ = rt_run(_run(_canopy_desc(n_layers=1, **kw)))
        R_3, *_ = rt_run(_run(_canopy_desc(
            n_layers=3, lai_fractions=(0.5, 0.3, 0.2), **kw)))
        np.testing.assert_allclose(R_3, R_1, rtol=1e-4)


class TestWithinCanopyAtmosphere:
    def _arrays(self, atm_tau, n_layers=3):
        from vsmartmom_tpu.scattering.stokes import STOKES_I
        from vsmartmom_tpu.surfaces.canopy import (CanopySurface,
                                                   canopy_surface_arrays)
        from vsmartmom_tpu.utils.quadrature import rt_set_streams
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.3])
        canopy = CanopySurface(soil=soil, LAI=2.0, n_layers=n_layers,
                               leaf_reflectance=0.4,
                               leaf_transmittance=0.05,
                               include_atm=True, canopy_dp=50.0)
        pol = STOKES_I
        quad = rt_set_streams(6, 30.0, [0.0, 30.0], 1)
        nu = np.array([13000.0, 13001.0, 13002.0])
        from vsmartmom_tpu.surfaces.lambertian import \
            lambertian_surface_arrays
        soil_r, soil_j = lambertian_surface_arrays(quad, 1, 3)
        return canopy_surface_arrays(canopy, quad, pol, 3, nu,
                                     0.3 * soil_r, 0.3 * soil_j,
                                     np.ones(3), atm_tau=atm_tau)

    def test_zero_atm_tau_matches_no_atm(self):
        n0, R0, J0 = self._arrays(None)
        nz, Rz, Jz = self._arrays(np.zeros(3))
        np.testing.assert_allclose(Rz[:, 0], R0[:, 0], rtol=1e-10)
        np.testing.assert_allclose(Jz[:, 0], J0[:, 0], rtol=1e-10)

    def test_absorption_darkens_and_is_spectral(self):
        """Within-canopy gas absorption removes upwelling signal, more at
        the more-absorbing spectral points, and the operators come back on
        the full grid."""
        atm = np.array([0.0, 0.5, 2.0])
        nodes, R, J = self._arrays(atm)
        assert len(nodes) == 3            # full-grid build
        _, R0, J0 = self._arrays(np.zeros(3))   # coarse build, 1 node
        # soil-reflected source weakens with absorption strength
        j_tot = J.sum(axis=(2, 3))        # (n_m, n_nodes)
        assert j_tot[0, 0] > j_tot[0, 1] > j_tot[0, 2]
        # the transparent point matches the no-absorption build
        np.testing.assert_allclose(J[:, 0], J0[:, 0], rtol=1e-10)
        np.testing.assert_allclose(R[:, 0], R0[:, 0], rtol=1e-10)

    def test_model_level_plumbing(self):
        """include_atm + canopy_dp at the model level routes bottom-layer
        absorption into the canopy build (reference
        _compute_canopy_atm_tau! vcd scaling)."""
        soil = SurfaceDescriptor("LambertianSurfaceScalar", [0.3])
        desc = _canopy_desc(soil=soil, LAI=2.0, n_layers=3,
                            leaf_reflectance=0.4, leaf_transmittance=0.05,
                            include_atm=True, canopy_dp=80.0)
        model = _run(desc, n_spec=3)
        band = model.bands[0]
        R_noabs, *_ = rt_run(model)
        band.tau_abs = np.zeros_like(band.tau_abs)
        band.tau_abs[:, -1] = np.array([0.0, 0.3, 1.5])
        R_abs, *_ = rt_run(model)
        # absorbing points darken relative to the transparent point
        ratio = R_abs[0, 0] / R_noabs[0, 0]
        assert ratio[0] == pytest.approx(1.0, abs=1e-6)
        assert ratio[1] < 1.0 and ratio[2] < ratio[1]
