"""Absorption module tests: Voigt CEF accuracy vs the exact Faddeeva
function, HITRAN .par parsing, TIPS partition sums, line-summation kernel
vs a direct NumPy evaluation, LUT interpolation, and the model-build wiring.

(The reference validates cross-sections against stored HITRAN artifacts;
this environment is zero-egress, so truth here is the exact wofz Faddeeva
function and synthetic line lists — same physics, analytic ground truth.)
"""

import os
import tempfile

import numpy as np
import pytest
from scipy.special import wofz

from vsmartmom_tpu.absorption.cross_section import (HitranModel,
                                                    InterpolationModel,
                                                    compute_absorption_cross_section,
                                                    compute_absorption_profile,
                                                    make_interpolation_model)
from vsmartmom_tpu.absorption.hitran import (HitranTable, mol_number,
                                             mol_weight, qoft, read_hitran)
from vsmartmom_tpu.absorption.voigt import (cef_humlicek_weideman32,
                                            humlicek_w4)

SQRT_LN2 = np.sqrt(np.log(2.0))
SQRT_LN2_PI = np.sqrt(np.log(2.0) / np.pi)


class TestCEF:
    def _grid(self):
        x = np.linspace(-30, 30, 301)
        y = np.logspace(-6, 2, 41)
        X, Y = np.meshgrid(x, y)
        return (X + 1j * Y).ravel()

    def test_humlicek_weideman_vs_faddeeva(self):
        import jax.numpy as jnp
        z = self._grid()
        mine = np.asarray(cef_humlicek_weideman32(jnp.asarray(z)))
        exact = wofz(z)
        rel = np.abs(mine.real - exact.real) / np.abs(exact.real)
        assert rel.max() < 1e-4, rel.max()

    def test_humlicek_w4_vs_faddeeva(self):
        import jax.numpy as jnp
        z = self._grid()
        mine = np.asarray(humlicek_w4(jnp.asarray(z)))
        exact = wofz(z)
        rel = np.abs(mine.real - exact.real) / np.abs(exact.real)
        assert rel.max() < 2e-4, rel.max()

    def test_weideman_coeff_generator_matches_table(self):
        """The FFT construction reproduces Weideman's published 32-term
        Table I (the in-repo hardcoded values) to machine precision."""
        from vsmartmom_tpu.absorption.voigt import (_WEIDEMAN32_A,
                                                    weideman_coeffs)
        np.testing.assert_allclose(weideman_coeffs(32), _WEIDEMAN32_A,
                                   atol=1e-14)

    def test_all_seven_cefs_vs_faddeeva(self):
        """Every reference CEF variant (types.jl:120-141) within its
        documented accuracy class against scipy wofz."""
        import jax.numpy as jnp
        from vsmartmom_tpu.absorption.voigt import CEFS
        z = self._grid()
        exact = wofz(z)
        tol = {"CPF12ErrorFunction": 2e-2,            # Humlicek-1979 class
               "ErfcErrorFunction": 1e-8}             # Weideman-64 far wing
        assert len(CEFS) == 7
        for name, f in CEFS.items():
            mine = np.asarray(f(jnp.asarray(z)))
            rel = np.abs(mine.real - exact.real) / np.abs(exact.real)
            assert rel.max() < tol.get(name, 2e-4), (name, rel.max())


class TestHitranMeta:
    def test_mol_ids(self):
        assert mol_number("O2") == 7
        assert mol_number("H2O") == 1
        assert mol_number("CO2") == 2

    def test_mol_weight(self):
        assert np.isclose(mol_weight(7, 1), 31.99, atol=0.1)   # O2 main
        assert np.isclose(mol_weight(1, 1), 18.01, atol=0.1)   # H2O main

    def test_qoft_identity_and_monotone(self):
        assert np.isclose(qoft(7, 1, 296.0), 1.0, rtol=1e-6)
        # Q grows with T, so Q(296)/Q(T) < 1 for T > 296
        assert qoft(7, 1, 320.0) < 1.0 < qoft(7, 1, 250.0)


def _synthetic_par(path, lines):
    """Write a fixed-width HITRAN .par file (160-char records)."""
    with open(path, "w") as f:
        for (mol, iso, nu, s, gair, gself, elow, nair, dair) in lines:
            rec = (f"{mol:2d}{iso:1d}{nu:12.6f}{s:10.3E}{1e-9:10.3E}"
                   f"{gair:5.4f}"[:30 + 5])
            rec = (f"{mol:2d}{iso:1d}{nu:12.6f}{s:10.3E}{1e-9:10.3E}"
                   f"{gair:5.3f}{gself:5.3f}{elow:10.4f}{nair:4.2f}"
                   f"{dair:8.5f}")
            rec = rec + " " * (160 - len(rec))
            f.write(rec + "\n")


@pytest.fixture(scope="module")
def o2_par(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hitran") / "o2_synth.par")
    rng = np.random.default_rng(7)
    lines = []
    for k in range(40):
        nu = 13040.0 + 2.0 * k + rng.uniform(-0.5, 0.5)
        s = 10 ** rng.uniform(-26, -24)
        lines.append((7, 1, nu, s, 0.045, 0.05, 100.0 + 10 * k, 0.7, -0.008))
    _synthetic_par(path, lines)
    return path


class TestLineByLine:
    def test_parse_roundtrip(self, o2_par):
        t = read_hitran(o2_par)
        assert len(t) == 40
        assert np.all(t.mol == 7) and np.all(t.iso == 1)
        assert np.all((t.nu > 13039) & (t.nu < 13121))
        assert np.all(t.gamma_air == pytest.approx(0.045, abs=1e-3))

    def test_kernel_vs_direct_numpy(self, o2_par):
        """The chunked JAX line-sum must match a dense NumPy wofz evaluation."""
        t = read_hitran(o2_par)
        model = HitranModel(hitran=t, wing_cutoff=40.0)
        grid = np.arange(13040.0, 13120.0, 0.02)
        p, T = 500.0, 250.0
        sigma = compute_absorption_cross_section(model, grid, p, T)

        # direct: same preprocessing, exact Faddeeva
        from vsmartmom_tpu.absorption.cross_section import _preprocess_lines
        nu, gd, gl, y, S = _preprocess_lines(model, grid, p, T)
        direct = np.zeros_like(grid)
        for j in range(len(nu)):
            x = SQRT_LN2 * (grid - nu[j]) / gd[j]
            prof = S[j] * SQRT_LN2_PI / gd[j] * wofz(x + 1j * y[j]).real
            prof[np.abs(grid - nu[j]) > 40.0] = 0.0
            direct += prof
        assert sigma.max() > 0
        rel = np.abs(sigma - direct) / direct.max()
        assert rel.max() < 1e-4

    def test_pressure_broadening_widens(self, o2_par):
        t = read_hitran(o2_par)
        model = HitranModel(hitran=t, wing_cutoff=40.0)
        grid = np.arange(13041.0, 13043.0, 0.002)
        lo = compute_absorption_cross_section(model, grid, 100.0, 250.0)
        hi = compute_absorption_cross_section(model, grid, 1000.0, 250.0)
        # peak lower, wings higher at high pressure
        assert hi.max() < lo.max()

    def test_profile_and_model_build(self, o2_par):
        from vsmartmom_tpu.core.atmosphere import compute_atmos_profile_fields
        from vsmartmom_tpu.core.model import (AbsorptionParams, Parameters,
                                              SurfaceDescriptor,
                                              model_from_parameters)
        from vsmartmom_tpu.scattering.stokes import STOKES_I
        prof = compute_atmos_profile_fields(
            np.array([230.0, 270.0]), np.array([10.0, 500.0, 1000.0]))
        t = read_hitran(o2_par)
        model = HitranModel(hitran=t, wing_cutoff=40.0)
        grid = np.arange(13040.0, 13100.0, 0.05)
        tau = compute_absorption_profile(model, grid, 0.21, prof)
        assert tau.shape == (len(grid), 2)
        assert tau.sum() > 0 and np.isfinite(tau).all()

        params = Parameters(
            spec_bands=[grid],
            surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [0.1])],
            nstreams=3, polarization=STOKES_I,
            sza=30.0, vza=[0.0], vaz=[0.0], obs_alt=1000.0,
            T=np.array([230.0, 270.0]), p=np.array([10.0, 500.0, 1000.0]),
            depol=0.0,
            absorption_params=AbsorptionParams(
                molecules=[["O2"]], vmr={"O2": 0.21},
                par_paths={"O2": o2_par}))
        rt_model = model_from_parameters(params)
        assert rt_model.bands[0].tau_abs.sum() > 0
        from vsmartmom_tpu import rt_run
        R, T_out = rt_run(rt_model)
        I = R[0, 0]
        assert np.isfinite(I).all() and I.min() > 0
        # absorption lines must carve the spectrum
        assert I.min() < 0.99 * I.max()

    def test_missing_line_data_warns(self, o2_par):
        from vsmartmom_tpu.core.model import (AbsorptionParams, Parameters,
                                              SurfaceDescriptor,
                                              model_from_parameters)
        from vsmartmom_tpu.scattering.stokes import STOKES_I
        params = Parameters(
            spec_bands=[np.array([13040.0, 13041.0])],
            surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [0.1])],
            nstreams=3, polarization=STOKES_I,
            sza=30.0, vza=[0.0], vaz=[0.0], obs_alt=1000.0,
            T=np.array([230.0, 270.0]), p=np.array([10.0, 500.0, 1000.0]),
            depol=0.0,
            absorption_params=AbsorptionParams(
                molecules=[["O2"]], vmr={"O2": 0.21}))
        with pytest.warns(UserWarning, match="No HITRAN line data"):
            model_from_parameters(params)


class TestLUT:
    def test_lut_matches_lbl(self, o2_par):
        t = read_hitran(o2_par)
        model = HitranModel(hitran=t, wing_cutoff=40.0)
        grid = np.arange(13040.0, 13060.0, 0.05)
        lut = make_interpolation_model(model, grid,
                                       p_grid=np.linspace(50, 1050, 11),
                                       t_grid=np.linspace(180, 310, 14))
        direct = compute_absorption_cross_section(model, grid, 500.0, 250.0)
        interp = lut.interpolate(grid, 500.0, 250.0)
        scale = direct.max()
        assert np.abs(interp - direct).max() / scale < 0.05
        # outside the table -> zero
        out = lut.interpolate(np.array([12000.0]), 500.0, 250.0)
        assert out[0] == 0.0

    def test_cubic_beats_linear(self, o2_par):
        """Cubic (reference BSpline order) interpolates T between table
        nodes more accurately than linear on the same LUT."""
        t = read_hitran(o2_par)
        model = HitranModel(hitran=t, wing_cutoff=40.0)
        grid = np.arange(13040.0, 13060.0, 0.05)
        kw = dict(p_grid=np.linspace(50, 1050, 6),
                  t_grid=np.linspace(180, 310, 6))
        cub = make_interpolation_model(model, grid, order="cubic", **kw)
        lin = make_interpolation_model(model, grid, order="linear", **kw)
        T_mid = 0.5 * (kw["t_grid"][2] + kw["t_grid"][3])   # between nodes
        direct = compute_absorption_cross_section(model, grid, 500.0, T_mid)
        scale = direct.max()
        err_c = np.abs(cub.interpolate(grid, 500.0, T_mid) - direct).max()
        err_l = np.abs(lin.interpolate(grid, 500.0, T_mid) - direct).max()
        assert err_c < err_l
        assert err_c / scale < 0.02

    def test_save_load_roundtrip(self, o2_par, tmp_path):
        """LUT persistence (reference JLD2 save/load,
        make_model_helpers.jl:113-119)."""
        t = read_hitran(o2_par)
        model = HitranModel(hitran=t, wing_cutoff=40.0)
        grid = np.arange(13040.0, 13050.0, 0.1)
        lut = make_interpolation_model(model, grid,
                                       p_grid=np.linspace(50, 1050, 5),
                                       t_grid=np.linspace(180, 310, 5))
        path = str(tmp_path / "o2_lut.npz")
        lut.save(path)
        lut2 = InterpolationModel.load(path)
        np.testing.assert_array_equal(lut.sigma, lut2.sigma)
        assert lut2.order == lut.order
        np.testing.assert_allclose(lut.interpolate(grid, 500.0, 250.0),
                                   lut2.interpolate(grid, 500.0, 250.0))


class TestWindowedKernel:
    """The windowed scatter-add path (uniform grids) must match the dense
    masked path bit-for-bit in physics (same profile function, same wing
    cutoff) — VERDICT round-1 item 6: O(nLines*W) hyperspectral kernel."""

    def test_windowed_matches_dense(self, o2_par):
        t = read_hitran(o2_par)
        model = HitranModel(hitran=t, wing_cutoff=10.0)
        # uniform hyperspectral grid: W = 2*10/0.01 ~ 2000 << n_grid = 8000
        grid = np.arange(13040.0, 13120.0, 0.01)
        p, T = 500.0, 250.0
        windowed = compute_absorption_cross_section(model, grid, p, T)
        dense = compute_absorption_cross_section(model, grid, p, T,
                                                 force_dense=True)
        scale = dense.max()
        assert scale > 0
        assert np.abs(windowed - dense).max() / scale < 1e-6

    def test_nonuniform_grid_falls_back(self, o2_par):
        t = read_hitran(o2_par)
        model = HitranModel(hitran=t, wing_cutoff=10.0)
        rng = np.random.default_rng(3)
        grid = np.sort(13040.0 + 80.0 * rng.random(4000))
        sigma = compute_absorption_cross_section(model, grid, 500.0, 250.0)
        dense = compute_absorption_cross_section(model, grid, 500.0, 250.0,
                                                 force_dense=True)
        np.testing.assert_allclose(sigma, dense, rtol=0, atol=0)

    def test_lorentz_and_doppler_windowed(self, o2_par):
        t = read_hitran(o2_par)
        grid = np.arange(13040.0, 13100.0, 0.01)
        for broadening in ("Lorentz", "Doppler"):
            model = HitranModel(hitran=t, wing_cutoff=5.0,
                                broadening=broadening)
            w = compute_absorption_cross_section(model, grid, 500.0, 250.0)
            d = compute_absorption_cross_section(model, grid, 500.0, 250.0,
                                                 force_dense=True)
            assert np.abs(w - d).max() / d.max() < 1e-6, broadening


class TestArtifacts:
    def test_register_lookup_provenance(self, o2_par, tmp_path, monkeypatch):
        monkeypatch.setenv("VSM_HITRAN_DIR", str(tmp_path / "cache"))
        from vsmartmom_tpu.absorption import artifacts as A
        A.set_hitran_edition("testlocal")
        assert not A.hitran_is_cached("O2")
        with pytest.raises(FileNotFoundError, match="zero-egress"):
            A.artifact("O2")
        A.register_par("O2", o2_par)
        assert A.hitran_is_cached("O2")
        p = A.artifact("O2")
        t = read_hitran(p)
        assert len(t.nu) > 0
        prov = A.hitran_provenance("O2")
        assert prov["sha256"] and prov["edition"] == "testlocal"
        # corruption detection
        with open(p, "a") as f:
            f.write("x")
        with pytest.raises(ValueError, match="corruption"):
            A.artifact("O2")
        A.set_hitran_edition("local")

    def test_model_uses_cache(self, o2_par, tmp_path, monkeypatch):
        monkeypatch.setenv("VSM_HITRAN_DIR", str(tmp_path / "cache2"))
        from vsmartmom_tpu.absorption import artifacts as A
        from vsmartmom_tpu.core.model import (AbsorptionParams, Parameters,
                                              SurfaceDescriptor,
                                              model_from_parameters)
        from vsmartmom_tpu.scattering.stokes import STOKES_I
        A.set_hitran_edition("modeltest")
        A.register_par("O2", o2_par)
        params = Parameters(
            spec_bands=[np.arange(13040.0, 13042.0, 0.2)],
            surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [0.1])],
            nstreams=3, polarization=STOKES_I, sza=30.0, vza=[0.0],
            vaz=[0.0], obs_alt=0.0, T=np.array([250.0, 275.0]),
            p=np.array([10.0, 500.0, 1000.0]),
            absorption_params=AbsorptionParams(
                molecules=[["O2"]], vmr={"O2": 0.21}))
        model = model_from_parameters(params)
        assert np.any(model.bands[0].tau_abs > 0)
        A.set_hitran_edition("local")
