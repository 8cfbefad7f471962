"""Aerosols module tests (reference src/Aerosols/).

Fixtures: a synthetic GEOS-Chem-like NetCDF-3 column file written in-test.
Truth anchors: analytic lognormal moment identities, exact Mie efficiencies
against van de Hulst limits, Angstrom scaling algebra, and unit-conversion
hand values.
"""

import numpy as np
import pytest

from vsmartmom_tpu.aerosols import (
    TOMAS15Scheme, TwoMomentScheme, bin_volume, compute_mass_concentration,
    compute_mie_efficiencies, compute_number_concentration,
    compute_optical_properties, effective_radius_from_moments,
    get_refractive_index, load_refractive_index_database,
    lognormal_size_distribution, median_radius_from_effective,
    read_aerosol_data, scale_aod_wavelength, to_rt_aerosols)

TOMAS_CFG = {
    "aerosol_scheme": {
        "type": "tomas15",
        "size_bins": {"n_bins": 15, "diam_min_nm": 3.0,
                      "diam_max_nm": 10000.0},
        "species": {
            "SF": {"refractive_index": "sulfate_suso", "density": 1780.0,
                   "molar_mass": 0.096},
        },
    },
    "processing": {"vertical_flip": True},
}

TM_CFG = {
    "aerosol_scheme": {
        "type": "two_moment",
        "species": {
            "SO4": {"sigma_g": 2.03, "aod_reference_wavelength": 0.55,
                    "refractive_index": "sulfate_suso",
                    "aod_variable": "AODHyg550nm_{species}",
                    "radius_variable": "AerHygroscopicRadius_{species}"},
        },
    },
}


def test_scheme_construction():
    s = TOMAS15Scheme.from_config(TOMAS_CFG)
    assert s.n_bins == 15
    assert len(s.bin_edges) == 16
    np.testing.assert_allclose(s.bin_edges[0], 3.0)
    np.testing.assert_allclose(s.bin_edges[-1], 10000.0)
    # geometric spacing: constant ratio
    r = s.bin_edges[1:] / s.bin_edges[:-1]
    np.testing.assert_allclose(r, r[0])
    np.testing.assert_allclose(s.bin_centers,
                               np.sqrt(s.bin_edges[:-1] * s.bin_edges[1:]))


def test_lognormal_moment_identities():
    r_med, sg = 0.1, 1.8
    r_eff = effective_radius_from_moments(r_med, sg)
    assert r_eff > r_med
    np.testing.assert_allclose(median_radius_from_effective(r_eff, sg),
                               r_med, rtol=1e-14)
    # dN/dr integrates to 1 and its 3rd/2nd moment ratio gives r_eff
    r = np.logspace(-4, 2, 20000)
    dndr = lognormal_size_distribution(r, r_eff, sg)
    np.testing.assert_allclose(np.trapezoid(dndr, r), 1.0, rtol=1e-6)
    m3 = np.trapezoid(dndr * r ** 3, r)
    m2 = np.trapezoid(dndr * r ** 2, r)
    np.testing.assert_allclose(m3 / m2, r_eff, rtol=1e-6)


def test_unit_conversions():
    # 1013 hPa, 288 K: n_air = p/kT = 2.547e19 /cm^3
    n = compute_number_concentration([1e-9], [101300.0], [288.0])
    np.testing.assert_allclose(n[0], 1e-9 * 101300.0 / (1.380649e-23 * 288.0)
                               * 1e-6, rtol=1e-12)
    m = compute_mass_concentration([1e-9], 0.096, [101300.0], [288.0])
    np.testing.assert_allclose(
        m[0], 1e-9 * 101300.0 * 0.096 / (8.314462618 * 288.0) * 1e9,
        rtol=1e-12)
    np.testing.assert_allclose(bin_volume(100.0),
                               4 / 3 * np.pi * 50.0 ** 3, rtol=1e-14)


def test_angstrom_scaling():
    np.testing.assert_allclose(scale_aod_wavelength(0.2, 0.55, 1.1, 1.0),
                               0.1, rtol=1e-12)
    assert scale_aod_wavelength(0.2, 0.55, 0.44, 1.3) > 0.2


def test_refractive_database():
    db = load_refractive_index_database()
    assert "sulfate_suso" in db.species()
    m = get_refractive_index(db, "sulfate_suso", 0.55)
    assert 1.40 < m.real < 1.45 and m.imag <= 0
    m_bc = get_refractive_index(db, "black_carbon", 0.55)
    assert -m_bc.imag > 0.3                     # soot absorbs strongly
    with pytest.raises(ValueError):
        get_refractive_index(db, "sulfate_suso", 50.0)
    with pytest.raises(KeyError):
        get_refractive_index(db, "unobtainium", 0.55)


def test_mie_efficiencies_limits():
    # Large non-absorbing sphere: extinction paradox Q_ext -> 2
    qe, qs, qa, g = compute_mie_efficiencies(200.0, complex(1.33, -1e-9))
    assert abs(qe - 2.0) < 0.15
    assert qa < 1e-4
    assert 0.7 < g < 0.95
    # Rayleigh limit: Q_sca ~ (8/3) x^4 |(m^2-1)/(m^2+2)|^2
    x, m = 0.01, complex(1.5, 0.0)
    qe, qs, qa, g = compute_mie_efficiencies(x, m)
    qs_ray = (8.0 / 3.0) * x ** 4 * abs((m ** 2 - 1) / (m ** 2 + 2)) ** 2
    np.testing.assert_allclose(qs, qs_ray, rtol=1e-3)
    assert abs(g) < 1e-3


def _write_tomas_nc(path, n_lev=5):
    from scipy.io import netcdf_file
    rng = np.random.default_rng(0)
    with netcdf_file(str(path), "w") as nc:
        nc.createDimension("nf", 2)
        nc.createDimension("Xdim", 2)
        nc.createDimension("Ydim", 2)
        nc.createDimension("lev", n_lev)
        nc.createDimension("time", 1)
        lev = nc.createVariable("lev", "d", ("lev",))
        lev[:] = np.arange(1, n_lev + 1, dtype=np.float64)
        dims5 = ("nf", "Xdim", "Ydim", "lev", "time")
        for name, scale in [("Met_AD", 3e15), ("Met_AIRVOL", 5e13)]:
            v = nc.createVariable(name, "d", dims5)
            v[:] = scale * (1.0 + 0.1 * rng.random((2, 2, 2, n_lev, 1)))
        for b in range(1, 16):
            v = nc.createVariable(f"SpeciesConcVV_NK{b:02d}", "d", dims5)
            v[:] = 1e-10 * b * (1.0 + 0.05 * rng.random((2, 2, 2, n_lev, 1)))
            v2 = nc.createVariable(f"SpeciesConcVV_SF{b}", "d", dims5)
            v2[:] = 1e-12 * (1.0 + 0.05 * rng.random((2, 2, 2, n_lev, 1)))


def test_read_tomas15(tmp_path):
    p = tmp_path / "geoschem_tomas.nc"
    _write_tomas_nc(p)
    data = read_aerosol_data(TOMAS_CFG, str(p))
    nk = data.species_data["_NK"].data["number"]
    assert nk.shape == (15, 5)
    assert np.all(nk > 0)
    sf = data.species_data["SF"]
    assert np.all(sf.data["mass"] > 0)
    assert np.all(sf.data["particle_number"] > 0)
    # optics from exact Mie
    db = load_refractive_index_database()
    props = compute_optical_properties(data, [0.55], db)
    assert props["extinction"].shape == (5, 1)
    assert np.all(props["extinction"] > 0)
    assert np.all((props["ssa"] >= 0) & (props["ssa"] <= 1))


def _write_two_moment_nc(path, n_lev=4):
    from scipy.io import netcdf_file
    with netcdf_file(str(path), "w") as nc:
        nc.createDimension("lev", n_lev)
        nc.createDimension("time", 1)
        lev = nc.createVariable("lev", "d", ("lev",))
        lev[:] = [200.0, 500.0, 800.0, 1000.0]
        a = nc.createVariable("AODHyg550nm_SO4", "d", ("lev", "time"))
        a[:] = np.array([[0.01], [0.05], [0.10], [0.04]])
        r = nc.createVariable("AerHygroscopicRadius_SO4", "d",
                              ("lev", "time"))
        r[:] = np.array([[0.10], [0.12], [0.15], [0.13]])


def test_read_two_moment_and_bridge(tmp_path):
    p = tmp_path / "geoschem_2m.nc"
    _write_two_moment_nc(p)
    data = read_aerosol_data(TM_CFG, str(p))
    aod = data.species_data["SO4"].data["aod"]
    np.testing.assert_allclose(aod.sum(), 0.20, rtol=1e-12)

    db = load_refractive_index_database()
    props = compute_optical_properties(data, [0.55, 1.1], db)
    # at the reference wavelength, extinction == AOD profile
    np.testing.assert_allclose(props["extinction"][:, 0], aod, rtol=1e-12)
    # Angstrom: half at doubled wavelength
    np.testing.assert_allclose(props["extinction"][:, 1], aod / 2,
                               rtol=1e-12)

    aers = to_rt_aerosols(data, db, p_full=np.array([200.0, 500.0, 800.0,
                                                     1000.0]))
    assert len(aers) == 1
    a = aers[0]
    np.testing.assert_allclose(a.tau_ref, 0.20, rtol=1e-12)
    assert 500.0 < a.p0 < 900.0            # AOD-weighted center
    assert a.n_r > 1.3 and a.n_i >= 0


class TestAltitudeFormProfile:
    """Altitude-form (z₀, σ₀) vertical profiles — the reference documents
    LogNormal(log z₀, σ₀)-in-height as the preferred form but stubs its
    layer integration (IO/Parameters.jl:495-556); here it integrates
    exactly on the hydrostatic z grid."""

    def _profile(self, nlay=20):
        from vsmartmom_tpu.core.atmosphere import compute_atmos_profile_fields
        p_half = np.linspace(1.0, 1013.0, nlay + 1)
        T = np.linspace(220.0, 290.0, nlay)
        return compute_atmos_profile_fields(T, p_half)

    def test_normalization_and_location(self):
        from vsmartmom_tpu.core.atmosphere import (aerosol_layer_tau_gauss_z,
                                                   layer_z_bounds)
        prof = self._profile()
        tau = aerosol_layer_tau_gauss_z(0.3, 3.0, 0.3, prof)
        np.testing.assert_allclose(tau.sum(), 0.3, rtol=1e-12)
        assert np.all(tau >= 0)
        # the peak layer must contain (or neighbor) the median altitude
        z_half = layer_z_bounds(prof) / 1e3
        i_peak = int(np.argmax(tau))
        assert z_half[i_peak + 1] <= 3.0 * 1.6 and z_half[i_peak] >= 3.0 / 1.6

    def test_matches_numerical_quadrature(self):
        """Exact CDF integration vs brute-force midpoint quadrature."""
        from vsmartmom_tpu.core.atmosphere import (aerosol_layer_tau_gauss_z,
                                                   layer_z_bounds)
        prof = self._profile()
        z0, s0 = 2.0, 0.4
        tau = aerosol_layer_tau_gauss_z(1.0, z0, s0, prof)
        z_half = layer_z_bounds(prof) / 1e3
        num = np.zeros(prof.nz)
        for i in range(prof.nz):
            z = np.linspace(max(z_half[i + 1], 1e-9), z_half[i], 4001)
            pdf = np.exp(-(np.log(z) - np.log(z0)) ** 2 / (2 * s0 ** 2)) / (
                z * s0 * np.sqrt(2 * np.pi))
            num[i] = np.trapezoid(pdf, z)
        num /= num.sum()
        np.testing.assert_allclose(tau, num, rtol=5e-4, atol=1e-9)

    def test_yaml_altitude_form_parses_and_runs(self, tmp_path):
        from vsmartmom_tpu import model_from_parameters, rt_run
        from vsmartmom_tpu.io.yaml_input import parameters_from_yaml
        import textwrap
        yaml_text = textwrap.dedent("""
        radiative_transfer:
          spec_bands:
            - 13200:0.4:13250
          surface:
            - LambertianSurfaceScalar(0.2)
          polarization_type: Stokes_I()
          nstreams: 4
          truncation: NoTruncation()
          depol: 0.0
          float_type: Float64
          architecture: default_architecture
        geometry:
          sza: 30.0
          vza: [0.0, 30.0]
          vaz: [0.0, 0.0]
          obs_alt: 1000.0
        atmospheric_profile:
          T: [231.76, 244.26, 258.53, 272.45, 285.26]
          p: [138.08, 386.96, 587.89, 793.97, 913.97, 1013.25]
          profile_reduction: -1
        scattering:
          aerosols:
            - "\u03c4_ref": 0.2
              "z\u2080": 2.0
              "\u03c3\u2080": 0.5
              phase_function: HenyeyGreensteinPhaseFunction(0.65)
              ssa: 0.95
          r_max: 10.0
          nquad_radius: 100
          "\u03bb_ref": 0.755
          decomp_type: NAI2()
        """)
        f = tmp_path / "alt_form.yaml"
        f.write_text(yaml_text)
        params = parameters_from_yaml(str(f))
        aer = params.scattering_params.rt_aerosols[0]
        assert aer.z0 == 2.0 and aer.sigma_z == 0.5 and aer.p0 is None
        model = model_from_parameters(params)
        comp = model.bands[0].aerosols[0]
        np.testing.assert_allclose(comp.tau_profile.sum(), 0.2 * comp.k_over_kref
                                   * (1 - comp.f_trunc * comp.ssa_raw)
                                   if comp.f_trunc else 0.2, rtol=0.2)
        R, T = rt_run(model)
        assert np.isfinite(R).all() and np.isfinite(T).all()

    def test_equivalent_pressure_form_scene(self):
        """A pressure-form aerosol whose per-layer profile is numerically
        matched to the altitude form gives the same radiances (the solver
        consumes only the integrated per-layer tau)."""
        from vsmartmom_tpu import model_from_parameters, rt_run
        from vsmartmom_tpu.core.model import (Parameters, RTAerosol,
                                              ScatteringParams,
                                              SurfaceDescriptor)
        from vsmartmom_tpu.scattering.stokes import STOKES_I

        def _params(aer):
            return Parameters(
                spec_bands=[np.array([13200.0, 13200.4])],
                surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [0.2])],
                nstreams=4, polarization=STOKES_I,
                sza=30.0, vza=[0.0, 30.0], vaz=[0.0, 0.0], obs_alt=0.0,
                T=np.linspace(230.0, 285.0, 5),
                p=np.linspace(200.0, 1013.0, 6), depol=0.0,
                scattering_params=ScatteringParams(
                    rt_aerosols=[aer], nquad_radius=100, r_max=10.0,
                    lambda_ref=0.755))

        aer_z = RTAerosol(tau_ref=0.2, z0=2.0, sigma_z=0.5,
                          phase_function_g=0.65, ssa=0.95)
        model_z = model_from_parameters(_params(aer_z))
        Rz, Tz = rt_run(model_z)

        # transplant the altitude-integrated profile into a pressure-form
        # model (profile override, the reference's test workflow)
        aer_p = RTAerosol(tau_ref=0.2, p0=700.0, sigma_p=50.0,
                          phase_function_g=0.65, ssa=0.95)
        model_p = model_from_parameters(_params(aer_p))
        model_p.bands[0].aerosols[0].tau_profile = \
            model_z.bands[0].aerosols[0].tau_profile
        Rp, Tp = rt_run(model_p)
        np.testing.assert_allclose(Rz, Rp, rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(Tz, Tp, rtol=1e-10, atol=1e-14)
