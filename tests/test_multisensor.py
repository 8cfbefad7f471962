"""Multi-sensor RT (reference rt_run_test_ms, rt_run_multisensor.jl:14-184).

Truth anchors: the TOA sensor must reproduce rt_run's (R, T) exactly; the
BOA sensor's downwelling must equal T (same two-stack algebra); a black
surface gives exactly zero BOA upwelling; intermediate levels interpolate
physically (diffuse downwelling grows toward BOA, upwelling is continuous
across an optically thin layer).
"""

import numpy as np
import pytest

from vsmartmom_tpu import model_from_parameters, rt_run
from vsmartmom_tpu.core.model import Parameters, SurfaceDescriptor
from vsmartmom_tpu.core.multisensor import rt_run_ms
from vsmartmom_tpu.scattering.stokes import STOKES_I, STOKES_IQU

NU = np.array([14000.0, 14010.0, 14020.0])


def _model(pol=STOKES_I, albedo=0.3, nlay=4, tau_tot=0.25):
    p_half = np.linspace(100.0, 1013.0, nlay + 1)
    params = Parameters(
        spec_bands=[NU],
        surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [albedo])],
        nstreams=4, polarization=pol,
        sza=45.0, vza=[20.0, 50.0], vaz=[0.0, 120.0], obs_alt=0.0,
        T=np.linspace(230.0, 290.0, nlay), p=p_half, depol=0.0)
    model = model_from_parameters(params)
    model.bands[0].tau_rayl[:] = tau_tot / nlay
    return model


@pytest.mark.parametrize("pol", [STOKES_I, STOKES_IQU])
def test_toa_sensor_equals_rt_run(pol):
    model = _model(pol=pol)
    R, T = rt_run(model)
    uwJ, dwJ = rt_run_ms(model, [0])
    np.testing.assert_allclose(uwJ[0], R, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(dwJ[0], T, rtol=1e-10, atol=1e-14)


def test_boa_downwelling_equals_T():
    model = _model()
    _, T = rt_run(model)
    nz = model.profile.nz
    uwJ, dwJ = rt_run_ms(model, [nz])
    np.testing.assert_allclose(dwJ[0], T, rtol=1e-8, atol=1e-12)


def test_black_surface_boa_upwelling_zero():
    model = _model(albedo=0.0)
    nz = model.profile.nz
    uwJ, _ = rt_run_ms(model, [nz])
    assert np.abs(uwJ[0]).max() == 0.0


def test_profile_physics():
    model = _model(albedo=0.3, nlay=4, tau_tot=0.5)
    nz = model.profile.nz
    levels = list(range(nz + 1))
    uwJ, dwJ = rt_run_ms(model, levels)
    # diffuse downwelling grows monotonically toward BOA (pure Rayleigh,
    # no absorption); skip the TOA slot (reports BOA T by convention)
    dw_I = dwJ[1:, 0, 0, 0]
    assert np.all(np.diff(dw_I) > 0)
    # upwelling at TOA matches R; deeper sensors see brighter upwelling
    # (closer to the reflecting surface + backscatter source)
    uw_I = uwJ[:, 0, 0, 0]
    assert np.all(uw_I > 0)
    assert uw_I[-1] < uw_I[0] * 5  # sane magnitudes, no blowup


def test_thin_layer_continuity():
    """Sensors separated by an optically thin layer see nearly the same
    field."""
    model = _model(nlay=4, tau_tot=0.5)
    model.bands[0].tau_rayl[:, 1] = 1e-6       # layer 2 almost empty
    uwJ, dwJ = rt_run_ms(model, [1, 2])
    np.testing.assert_allclose(uwJ[0], uwJ[1], rtol=2e-5, atol=1e-10)
    np.testing.assert_allclose(dwJ[0], dwJ[1], rtol=2e-5, atol=1e-10)
