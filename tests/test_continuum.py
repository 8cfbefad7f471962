"""CIA + MT_CKD continuum tests (reference: src/Absorption/{cia,mtckd}.jl).

Fixtures are synthesized in-test (a tiny HITRAN-format .cia file and a tiny
NetCDF-3 MT_CKD table) and results are checked against hand-computed values
of the published formulas: tau_CIA = sigma(nu,T) n_A n_B dz and the LBLRTM
radterm convention for MT_CKD.
"""

import numpy as np
import pytest

from vsmartmom_tpu.absorption.continuum import (
    K_B, MTCKD_C2, VMR_O2_DEFAULT, build_mtckd_band, cia_sigma_at_T,
    compute_tau_cia, compute_tau_h2o_continuum, load_cia_table, load_mtckd,
    parse_cia_file)
from vsmartmom_tpu.core.atmosphere import compute_atmos_profile_fields


def _write_cia(path):
    """Two O2-O2 blocks at 200 K and 300 K, sigma linear in nu."""
    lines = []
    for T, s0 in [(200.0, 1.0e-45), (300.0, 2.0e-45)]:
        header = ("O2-O2".ljust(20) + f"{1000.0:10.3f}" + f"{1010.0:10.3f}"
                  + f"{3:7d}" + f"{T:7.1f}" + f"{s0:10.3e}")
        lines.append(header)
        for k, nu in enumerate([1000.0, 1005.0, 1010.0]):
            lines.append(f" {nu:.3f} {s0 * (1 + k):.6e}")
    path.write_text("\n".join(lines) + "\n")


def test_cia_parse_and_interp(tmp_path):
    p = tmp_path / "o2o2.cia"
    _write_cia(p)
    blocks = parse_cia_file(str(p))
    assert len(blocks) == 2
    assert blocks[0].formula == "O2-O2"
    assert blocks[0].T == 200.0
    np.testing.assert_allclose(blocks[0].sigma,
                               [1e-45, 2e-45, 3e-45])

    nu_grid = np.array([999.0, 1000.0, 1002.5, 1010.0, 1011.0])
    table = load_cia_table(str(p), nu_grid)
    assert table.species_a == "O2" and table.species_b == "O2"
    # 200 K column: zero outside [1000, 1010], linear inside
    np.testing.assert_allclose(table.sigma_nuT[:, 0],
                               [0.0, 1e-45, 1.5e-45, 3e-45, 0.0])
    # T-interpolation: midpoint of the two blocks at 250 K
    sig = cia_sigma_at_T(table, 250.0)
    np.testing.assert_allclose(sig[1], 1.5e-45)
    # constant extrapolation
    np.testing.assert_allclose(cia_sigma_at_T(table, 150.0),
                               table.sigma_nuT[:, 0])
    np.testing.assert_allclose(cia_sigma_at_T(table, 400.0),
                               table.sigma_nuT[:, 1])


def test_cia_tau_hand_value(tmp_path):
    p = tmp_path / "o2o2.cia"
    _write_cia(p)
    nu_grid = np.array([1005.0])
    table = load_cia_table(str(p), nu_grid)

    profile = compute_atmos_profile_fields(
        T=[250.0], p_half=[500.0, 1000.0])
    tau = compute_tau_cia(table, profile, {})
    # hand: sigma(1005, 250K) = mean(2e-45, 4e-45) = 3e-45 cm^5/molec^2
    n_air = 750.0 * 1e2 / (K_B * 250.0) * 1e-6      # molec/cm^3
    dz_cm = profile.dz[0] * 100.0
    expect = 3e-45 * VMR_O2_DEFAULT ** 2 * n_air ** 2 * dz_cm
    np.testing.assert_allclose(tau[0, 0], expect, rtol=1e-12)
    assert tau[0, 0] > 0


def _write_mtckd(path):
    from scipy.io import netcdf_file
    nu = np.arange(0.0, 2001.0, 10.0)
    with netcdf_file(str(path), "w") as nc:
        nc.createDimension("wavenumbers", len(nu))
        nc.createDimension("scalar", 1)
        v = nc.createVariable("wavenumbers", "d", ("wavenumbers",))
        v[:] = nu
        for name, val in [("self_absco_ref", 1e-23 * np.ones_like(nu)),
                          ("for_absco_ref", 2e-24 * np.ones_like(nu)),
                          ("self_texp", 6.0 * np.ones_like(nu))]:
            v = nc.createVariable(name, "d", ("wavenumbers",))
            v[:] = val
        v = nc.createVariable("ref_press", "d", ("scalar",))
        v[:] = [1013.0]
        v = nc.createVariable("ref_temp", "d", ("scalar",))
        v[:] = [296.0]


def test_mtckd_hand_value(tmp_path):
    p = tmp_path / "mtckd.nc"
    _write_mtckd(p)
    table = load_mtckd(str(p))
    assert table.p_ref == 1013.0 and table.T_ref == 296.0

    nu_grid = np.array([500.0, 3000.0])   # second point outside table range
    band = build_mtckd_band(table, nu_grid)
    assert band.C_self[1] == 0.0

    profile = compute_atmos_profile_fields(
        T=[280.0], p_half=[900.0, 1000.0],
        q=np.array([0.005]))
    tau = compute_tau_h2o_continuum(table, nu_grid, profile,
                                    profile.vmr_h2o)
    # hand computation at nu=500
    T, P = 280.0, 950.0
    v_h = float(profile.vmr_h2o[0])
    n_h2o = v_h * P * 1e2 / (K_B * T) * 1e-6
    p_h2o = v_h * P
    radterm = 500.0 * np.tanh(MTCKD_C2 * 500.0 / (2 * T))
    sig_s = 1e-23 * radterm * (p_h2o / 1013.0) * (296.0 / T) ** 6.0
    sig_f = 2e-24 * radterm * ((P - p_h2o) / 1013.0)
    expect = (sig_s + sig_f) * n_h2o * profile.dz[0] * 100.0
    np.testing.assert_allclose(tau[0, 0], expect, rtol=1e-12)
    assert tau[1, 0] == 0.0


def test_model_integration_cia(tmp_path):
    """AbsorptionParams.cia_files contributes to the band tau_abs."""
    from vsmartmom_tpu.core.model import (AbsorptionParams, Parameters,
                                          SurfaceDescriptor,
                                          model_from_parameters)
    from vsmartmom_tpu.scattering.stokes import STOKES_I

    p = tmp_path / "o2o2.cia"
    _write_cia(p)
    params = Parameters(
        spec_bands=[np.array([1002.0, 1005.0])],
        surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [0.1])],
        nstreams=2, polarization=STOKES_I, sza=30.0, vza=[0.0], vaz=[0.0],
        obs_alt=1000.0, T=np.array([250.0, 270.0]),
        p=np.array([100.0, 500.0, 1000.0]),
        absorption_params=AbsorptionParams(
            molecules=[[]], vmr={}, cia_files=[str(p)]))
    model = model_from_parameters(params)
    assert np.all(model.bands[0].tau_abs > 0)
