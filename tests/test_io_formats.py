"""IO completeness: schema validation, TOML, safe numeric parsing,
RadauQuad, LambertianSurfaceSpline, GeosChem column reader."""

import textwrap

import numpy as np
import pytest

from vsmartmom_tpu.io.formats import load_config, validate_config
from vsmartmom_tpu.io.yaml_input import (_eval_number, parameters_from_file,
                                         parameters_from_yaml)

QUICKSTART = "/root/reference/config/quickstart.yaml"


class TestSchemaValidation:
    def test_reference_configs_validate(self):
        import glob
        for p in sorted(glob.glob("/root/reference/config/*.yaml")):
            parameters_from_file(p)   # validate=True default

    def test_unknown_key_rejected(self):
        d = load_config(QUICKSTART)
        d["radiative_transfer"]["not_a_real_key"] = 1
        with pytest.raises(ValueError, match="not_a_real_key"):
            validate_config(d)

    def test_unknown_section_rejected(self):
        d = load_config(QUICKSTART)
        d["mystery_section"] = {}
        with pytest.raises(ValueError):
            validate_config(d)


class TestSafeNumericParser:
    def test_arithmetic(self):
        assert _eval_number("(1e7/770)") == pytest.approx(1e7 / 770)
        assert _eval_number("2+3*4") == 14.0
        assert _eval_number("-1.5e3") == -1500.0

    def test_rejects_code(self):
        for bad in ("__import__('os')", "().__class__", "open('x')",
                    "1 if 1 else 2", "[1,2]"):
            with pytest.raises(ValueError):
                _eval_number(bad)


class TestTOML:
    def test_toml_roundtrip(self, tmp_path):
        toml_text = textwrap.dedent("""
            [radiative_transfer]
            spec_bands = ["12987.0"]
            surface = ["LambertianSurfaceScalar(0.15)"]
            nstreams = 3
            polarization_type = "Stokes_I()"
            depol = 0.0
            float_type = "Float64"
            architecture = "default_architecture"

            [geometry]
            sza = 30.0
            vza = [0.0]
            vaz = [0.0]
            obs_alt = 0.0

            [atmospheric_profile]
            T = [250.0, 275.0]
            p = [10.0, 500.0, 1000.0]
            profile_reduction = -1
        """)
        p = tmp_path / "scene.toml"
        p.write_text(toml_text)
        params = parameters_from_file(str(p))
        assert params.nstreams == 3
        assert params.spec_bands[0][0] == pytest.approx(12987.0)

    def test_unregistered_extension(self, tmp_path):
        p = tmp_path / "scene.xml"
        p.write_text("<x/>")
        with pytest.raises(ValueError, match="No parser registered"):
            load_config(str(p))


class TestRadauQuad:
    def test_gaussradau_rule(self):
        from vsmartmom_tpu.utils.quadrature import gaussradau
        for n in (2, 4, 7):
            x, w = gaussradau(n)
            assert x[0] == -1.0
            assert np.sum(w) == pytest.approx(2.0, abs=1e-13)
            # exact for polynomials up to degree 2n-2
            for deg in range(2 * n - 1):
                exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
                assert np.sum(w * x ** deg) == pytest.approx(
                    exact, abs=1e-12), (n, deg)

    def test_sza_is_weighted_node(self):
        from vsmartmom_tpu.utils.quadrature import rt_set_streams_radau
        q = rt_set_streams_radau(8, 30.0, [0.0, 45.0], 1)
        i = q.i_mu0
        assert q.qp_mu[i] == pytest.approx(np.cos(np.deg2rad(30.0)), abs=1e-12)
        assert q.wt_mu[i] > 0                      # DNI: full weighted node
        # weights integrate mu over [0,1]
        assert np.sum(q.wt_mu) == pytest.approx(1.0, abs=1e-12)

    def test_radau_forward_runs(self):
        import jax
        from vsmartmom_tpu.core.model import (Parameters, SurfaceDescriptor,
                                              model_from_parameters)
        from vsmartmom_tpu.core.solver import rt_run
        from vsmartmom_tpu.scattering.stokes import STOKES_I
        params = Parameters(
            spec_bands=[np.array([14000.0])],
            surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [0.1])],
            nstreams=6, polarization=STOKES_I, sza=30.0,
            vza=[0.0, 30.0], vaz=[0.0, 0.0], obs_alt=0.0,
            T=np.array([250.0, 275.0]), p=np.array([10.0, 500.0, 1000.0]),
            quadrature="RadauQuad")
        R, T = rt_run(model_from_parameters(params))
        assert np.all(np.isfinite(R)) and np.all(R > 0)
        # Gauss-Legendre gives the same radiance to quadrature accuracy
        params_gl = Parameters(
            **{**params.__dict__, "quadrature": "GaussLegQuad"})
        R2, _ = rt_run(model_from_parameters(params_gl))
        np.testing.assert_allclose(R, R2, rtol=2e-3)


class TestSplineSurface:
    def test_spline_albedo_applied(self):
        from vsmartmom_tpu.core.model import (Parameters, SurfaceDescriptor,
                                              model_from_parameters)
        from vsmartmom_tpu.core.solver import rt_run
        from vsmartmom_tpu.scattering.stokes import STOKES_I
        nu = np.linspace(14000.0, 14300.0, 5)
        wl = 1e7 / nu
        knots = np.linspace(wl.min() - 10, wl.max() + 10, 8)
        albs = 0.1 + 0.05 * np.linspace(0, 1, 8)
        surf = SurfaceDescriptor("LambertianSurfaceSpline", [],
                                 {"grid": knots, "albedo": albs,
                                  "grid_unit": "nm"})
        params = Parameters(
            spec_bands=[nu], surfaces=[surf], nstreams=4,
            polarization=STOKES_I, sza=30.0, vza=[0.0], vaz=[0.0],
            obs_alt=0.0, T=np.array([250.0, 275.0]),
            p=np.array([10.0, 500.0, 1000.0]))
        model = model_from_parameters(params)
        inputs, _ = model.build_band(0)
        from scipy.interpolate import CubicSpline
        cs = CubicSpline(knots, albs)
        np.testing.assert_allclose(np.asarray(inputs.surf_spec), cs(wl),
                                   rtol=1e-10)
        R, _ = rt_run(model)
        assert np.all(np.isfinite(R))


class TestGeosChem:
    def test_column_reader(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        path = str(tmp_path / "gchp.nc4")
        nlev, nf, ny, nx = 5, 6, 3, 4
        rng = np.random.default_rng(0)
        with h5py.File(path, "w") as f:
            f["Met_DELP"] = np.broadcast_to(
                np.linspace(180, 220, nlev)[None, :, None, None, None],
                (1, nlev, nf, ny, nx)).copy()
            f["Met_PS2WET"] = np.full((1, nf, ny, nx), 1000.0)
            f["Met_T"] = np.broadcast_to(
                np.linspace(280, 220, nlev)[None, :, None, None, None],
                (1, nlev, nf, ny, nx)).copy()
            f["Met_SPHU"] = rng.random((1, nlev, nf, ny, nx))
            f["SpeciesConcVV_CO2"] = np.full((1, nlev, nf, ny, nx), 400e-6)
        from vsmartmom_tpu.io.geoschem import GeosChemSource, geoschem_to_dict
        d = geoschem_to_dict(GeosChemSource(path, 1, 2, 3))
        prof = d["atmospheric_profile"]
        assert prof["T"].shape == (nlev,)
        assert prof["T"][0] == pytest.approx(220.0)     # TOA first
        assert prof["p"].shape == (nlev + 1,)
        assert prof["p"][-1] == pytest.approx(1000.0)   # surface last
        assert np.all(np.diff(prof["p"]) > 0)           # TOA -> BOA increasing
        assert d["absorption_vmr"]["CO2"][0] == pytest.approx(400e-6)

    def test_profile_builds_model(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        path = str(tmp_path / "gchp2.nc4")
        nlev = 6
        with h5py.File(path, "w") as f:
            f["Met_DELP"] = np.full((1, nlev, 1, 1, 1), 990.0 / nlev)
            f["Met_PS2WET"] = np.full((1, 1, 1, 1), 1000.0)
            f["Met_T"] = np.linspace(280, 220, nlev).reshape(1, nlev, 1, 1, 1)
            f["Met_SPHU"] = np.full((1, nlev, 1, 1, 1), 1.0)
        from vsmartmom_tpu.io.geoschem import (GeosChemSource,
                                               read_geoschem_profile)
        T, p, q, vmr = read_geoschem_profile(GeosChemSource(path, 0, 0, 0))
        from vsmartmom_tpu.core.atmosphere import compute_atmos_profile_fields
        prof = compute_atmos_profile_fields(T, p, q)
        assert prof.nz == nlev
