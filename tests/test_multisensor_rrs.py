"""Multisensor + inelastic (MS-RS) — reference CompositeLayerMSRS
(types.jl:339-422, rt_kernel_multisensor.jl, interaction_multisensor.jl).

Truth anchors:
  * the TOA sensor must reproduce rt_run_inelastic's (R, T, ieR, ieT)
    exactly (same full-column composition);
  * with a vacuum (tau -> 0) upper stack, an airborne sensor below it
    must see the TOA field of the remaining column (continuity limit);
  * the BOA sensor's inelastic downwelling equals the full solver's ieT
    for a black surface (the surface adds no ie coupling).
"""

import numpy as np
import pytest

from vsmartmom_tpu import model_from_parameters
from vsmartmom_tpu.core.inelastic import rt_run_inelastic
from vsmartmom_tpu.core.model import Parameters, SurfaceDescriptor
from vsmartmom_tpu.core.multisensor import rt_run_ms_rrs
from vsmartmom_tpu.scattering.stokes import STOKES_I, STOKES_IQU

NU = np.arange(12950.0, 13200.0, 2.0)


def _model(pol=STOKES_I, albedo=0.0, taus=(0.075, 0.075)):
    nlay = len(taus)
    p_half = np.linspace(100.0, 1013.0, nlay + 1)
    params = Parameters(
        spec_bands=[NU],
        surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [albedo])],
        nstreams=4, polarization=pol,
        sza=45.0, vza=[0.0, 40.0], vaz=[0.0, 90.0], obs_alt=0.0,
        T=np.linspace(250.0, 285.0, nlay), p=p_half, depol=-1.0)
    model = model_from_parameters(params)
    for i, t in enumerate(taus):
        model.bands[0].tau_rayl[:, i] = t     # tau_rayl is (nSpec, Nz)
    return model


@pytest.mark.parametrize("pol", [STOKES_I, STOKES_IQU])
def test_toa_sensor_equals_full_inelastic(pol):
    model = _model(pol=pol)
    R, T, ieR, ieT = rt_run_inelastic(model)
    uwJ, dwJ, ieuwJ, iedwJ = rt_run_ms_rrs(model, [0])
    np.testing.assert_allclose(uwJ[0], R, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(dwJ[0], T, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(ieuwJ[0], ieR, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(iedwJ[0], ieT, rtol=1e-10, atol=1e-14)


def test_boa_down_black_surface_equals_ieT():
    model = _model(albedo=0.0)
    _, T, _, ieT = rt_run_inelastic(model)
    nz = model.profile.nz
    uwJ, dwJ, ieuwJ, iedwJ = rt_run_ms_rrs(model, [nz])
    np.testing.assert_allclose(dwJ[0], T, rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(iedwJ[0], ieT, rtol=1e-6, atol=1e-13)
    # black surface: nothing comes back up at BOA, elastic or inelastic
    assert np.abs(uwJ[0]).max() == 0.0
    assert np.abs(ieuwJ[0]).max() == 0.0


def test_vacuum_top_equals_reduced_column():
    """Sensor under a vacuum layer == TOA of the one-layer scene."""
    thin = 1e-9
    model2 = _model(taus=(thin, 0.15))          # vacuum above the sensor
    uwJ, dwJ, ieuwJ, iedwJ = rt_run_ms_rrs(model2, [1])

    model1 = _model(taus=(thin / 2, 0.15))      # same column, TOA view
    R, T, ieR, ieT = rt_run_inelastic(model1)
    np.testing.assert_allclose(uwJ[0], R, rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(ieuwJ[0], ieR, rtol=1e-4, atol=1e-14)


def test_airborne_level_physical():
    """Intermediate sensor: inelastic filling-in present, bounded by the
    TOA/BOA values' order of magnitude, and downwelling ie grows with
    depth (more Raman path below... above)."""
    model = _model(albedo=0.3, taus=(0.075, 0.075))
    uwJ, dwJ, ieuwJ, iedwJ = rt_run_ms_rrs(model, [0, 1, 2])
    assert np.isfinite(ieuwJ).all() and np.isfinite(iedwJ).all()
    # level-0 convention reports (TOA up, BOA down): its downwelling pair
    # must equal the BOA sensor's
    np.testing.assert_allclose(iedwJ[0], iedwJ[2], rtol=1e-10, atol=1e-14)
    # diffuse ie downwelling accumulates with path length above the sensor
    mid, boa = np.abs(iedwJ[1]).max(), np.abs(iedwJ[2]).max()
    assert 0 < mid <= boa * (1 + 1e-9)
    # magnitudes: ie is a small correction to the elastic field
    assert np.abs(ieuwJ).max() < 0.1 * np.abs(uwJ).max()


def test_flagship_aerosol_coxmunk_iqu():
    """Flagship-class MS-RS (VERDICT r4 item 6): scattering aerosol over a
    wind-roughened Cox-Munk ocean, Stokes IQU. The TOA sensor must
    reproduce the full inelastic solver on the same scene — this
    exercises the aerosol ie dilution (fScattRayleigh < 1), the polarized
    numeric-BRDF surface inside the ie adding, and the high-m Fourier
    loop the ocean surface drives. A mid-column sensor must stay
    physical. Ref: rt_kernel_multisensor.jl, interaction_multisensor.jl."""
    from vsmartmom_tpu.core.model import RTAerosol, ScatteringParams

    params = Parameters(
        spec_bands=[NU],
        surfaces=[SurfaceDescriptor("CoxMunkSurface", [],
                                    {"wind_speed": 6.0})],
        nstreams=4, polarization=STOKES_IQU,
        sza=45.0, vza=[0.0, 40.0], vaz=[0.0, 90.0], obs_alt=0.0,
        T=np.linspace(250.0, 285.0, 2), p=np.linspace(100.0, 1013.0, 3),
        depol=-1.0,
        scattering_params=ScatteringParams(
            rt_aerosols=[RTAerosol(tau_ref=0.2, p0=900.0, sigma_p=80.0,
                                   phase_function_g=0.7, ssa=0.9)],
            nquad_radius=100, r_max=10.0, lambda_ref=1e4 / 13000.0))
    model = model_from_parameters(params)

    R, T, ieR, ieT = rt_run_inelastic(model)
    uwJ, dwJ, ieuwJ, iedwJ = rt_run_ms_rrs(model, [0, 1])
    np.testing.assert_allclose(uwJ[0], R, rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(dwJ[0], T, rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(ieuwJ[0], ieR, rtol=1e-6, atol=1e-14)
    np.testing.assert_allclose(iedwJ[0], ieT, rtol=1e-6, atol=1e-14)

    # the ie field is a real signal and the aerosol dilutes it relative
    # to a pure-Rayleigh column of the same scattering depth
    assert np.abs(ieR).max() > 0
    # mid-column sensor: finite, polarized-physical (|Q|,|U| <= I)
    for J in (uwJ[1], dwJ[1], ieuwJ[1], iedwJ[1]):
        assert np.all(np.isfinite(J))
    I_mid = uwJ[1][:, 0]
    assert np.all(np.abs(uwJ[1][:, 1]) <= I_mid + 1e-12)
    assert np.all(np.abs(uwJ[1][:, 2]) <= I_mid + 1e-12)
