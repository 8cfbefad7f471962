"""Float32 vs Float64 product consistency (reference test/test_float32.jl;
published F32 accuracy table benchmarks.md:160-268: Siewert IIA F32 max
0.30% on I, 0.50% on Q).

F32 is the production TPU mode (bench.py and __graft_entry__ run f32), so
this gate is load-bearing: it catches precision regressions in the
elemental/doubling/interaction chain (e.g. the exp/expm1 restructuring)
that the f64 parity suites cannot see.
"""

import numpy as np
import pytest

from vsmartmom_tpu.core.model import (Parameters, SurfaceDescriptor,
                                      model_from_parameters)
from vsmartmom_tpu.core.solver import rt_run
from vsmartmom_tpu.scattering.stokes import STOKES_I, STOKES_IQU, STOKES_IQUV

T33 = np.linspace(244.0, 285.0, 33)
P34 = np.logspace(np.log10(0.14), np.log10(980.0), 34)

# Reference F32 gates (benchmarks.md:162,200 — max rel err vs F64/truth)
GATE_I = 3e-3
GATE_QU = 5e-3


def _run(float_type, pol=STOKES_IQUV, surface=None, nstreams=8, n_spec=8):
    surface = surface or SurfaceDescriptor("LambertianSurfaceScalar", [0.1])
    params = Parameters(
        spec_bands=[19417.0 + 3.0 * np.arange(n_spec)],
        surfaces=[surface], nstreams=nstreams, polarization=pol,
        sza=45.0, vza=[0.0, 30.0, 60.0], vaz=[0.0, 90.0, 180.0],
        obs_alt=1000.0, T=T33, p=P34, profile_reduction=8,
        depol=-1.0, float_type=float_type)
    return rt_run(model_from_parameters(params))


class TestF32Consistency:
    @pytest.mark.parametrize("pol", [STOKES_I, STOKES_IQU],
                             ids=["I", "IQU"])
    def test_rayleigh_lambertian(self, pol):
        R64, T64 = _run(np.float64, pol=pol)
        R32, T32 = _run(np.float32, pol=pol)
        scale_I = np.abs(R64[:, 0]).max()
        assert np.abs(R32[:, 0] - R64[:, 0]).max() / scale_I < GATE_I
        assert np.abs(T32[:, 0] - T64[:, 0]).max() / \
            np.abs(T64[:, 0]).max() < GATE_I
        if pol.n > 1:
            # Q/U gated relative to the I scale (the reference's F32 table
            # normalizes per-component against published truth magnitudes;
            # Q here is ~5-10% of I)
            assert np.abs(R32[:, 1] - R64[:, 1]).max() / scale_I < GATE_QU
            assert np.abs(R32[:, 2] - R64[:, 2]).max() / scale_I < GATE_QU

    def test_coxmunk_iquv(self):
        surf = SurfaceDescriptor("CoxMunkSurface", [], {"wind_speed": 6.0})
        R64, _ = _run(np.float64, pol=STOKES_IQUV, surface=surf)
        R32, _ = _run(np.float32, pol=STOKES_IQUV, surface=surf)
        scale_I = np.abs(R64[:, 0]).max()
        assert np.abs(R32[:, 0] - R64[:, 0]).max() / scale_I < GATE_I
        for k in (1, 2, 3):
            assert np.abs(R32[:, k] - R64[:, k]).max() / scale_I < GATE_QU, k

    def test_f32_outputs_are_f32_pipeline(self):
        """The f32 model must actually run the solver in f32 (not silently
        promote) — check via the jitted solve output dtype."""
        import jax
        from vsmartmom_tpu.core.solver import rt_solve
        params = Parameters(
            spec_bands=[19417.0 + np.arange(4.0)],
            surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [0.1])],
            nstreams=4, polarization=STOKES_I,
            sza=45.0, vza=[30.0], vaz=[0.0], obs_alt=1000.0,
            T=T33, p=P34, profile_reduction=4, depol=0.0,
            float_type=np.float32)
        model = model_from_parameters(params)
        inputs, config = model.build_band(0)
        out = rt_solve(inputs, config)
        assert out["R"].dtype == np.float32
