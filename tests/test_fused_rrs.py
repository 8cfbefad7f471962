"""Parity of the block-bichromatic RRS band kernel (ops/fused_rrs.py +
rt_solve_rrs_fused) against the XLA reference-shaped RRS path.

The fused path runs the Pallas kernel in interpreter mode on CPU with
identical semantics to the compiled TPU path (same contract the elastic
band kernel's tests rely on); tests/test_tpu_compiled.py adds the
compiled-chip gate.
"""

import dataclasses

import numpy as np
import pytest

from vsmartmom_tpu import model_from_parameters
from vsmartmom_tpu.core.inelastic import (inelastic_setup, rt_solve_rrs,
                                          rt_solve_rrs_fused)
from vsmartmom_tpu.core.model import Parameters, SurfaceDescriptor
from vsmartmom_tpu.scattering.stokes import STOKES_I, STOKES_IQU


def _setup(pol, n_spec=48, albedo=0.1, nstreams=4):
    nu = 12950.0 + 2.4 * np.arange(n_spec)
    params = Parameters(
        spec_bands=[nu],
        surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [albedo])],
        nstreams=nstreams, polarization=pol,
        sza=42.0, vza=[15.0, 45.0], vaz=[0.0, 30.0], obs_alt=0.0,
        T=np.array([240.0, 260.0, 280.0]),
        p=np.array([200.0, 500.0, 800.0, 1013.0]),
        depol=-1.0, float_type=np.float32)
    model = model_from_parameters(params)
    model.bands[0].sif_spec = 2e-3 * np.ones(n_spec)
    return inelastic_setup(model)


@pytest.fixture()
def ie_fullres(monkeypatch):
    """Force the ie ladder to the elastic resolution so structural parity
    is tested at the 1e-4 level (the production coarse-ie ladder carries a
    deliberate O(1e-3) resolution delta — tested separately below). The
    env flag is read at trace time, so the jit caches must be dropped."""
    import jax
    monkeypatch.setenv("VSM_IE_FULLRES", "1")
    jax.clear_caches()
    yield
    jax.clear_caches()


@pytest.mark.parametrize("pol", [STOKES_I, STOKES_IQU],
                         ids=["I", "IQU"])
def test_fused_rrs_matches_xla(pol, ie_fullres):
    (inputs, config, shifts, w_shifts, Z_r_pp, Z_r_mp, fscatt,
     src_fn) = _setup(pol)
    assert len(shifts) >= 4

    ref = rt_solve_rrs(inputs, config, shifts, w_shifts, Z_r_pp, Z_r_mp,
                       fscatt, src_fn=src_fn)
    # Exercise the packed block-diagonal layout of the elastic kernel too.
    cfg = dataclasses.replace(config, fused=True, pack=2)
    out = rt_solve_rrs_fused(inputs, cfg, shifts, w_shifts, Z_r_pp,
                             Z_r_mp, fscatt)

    for k in ("R", "T"):
        a, b = np.asarray(out[k]), np.asarray(ref[k])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30)
        assert rel < 2e-5, (k, rel)
    for k in ("ieR", "ieT"):
        a, b = np.asarray(out[k]), np.asarray(ref[k])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30)
        # ie gate: the block kernel runs the ladder at the elastic
        # dot_mode (split3d in production, exact-f32 here) while the XLA
        # path's IE_PRECISION default is single-pass — compare at the
        # structural level, not the dot-precision level.
        assert rel < 1e-4, (k, rel)
    # the ie field must be a real signal, not zeros
    assert np.max(np.abs(np.asarray(out["ieR"]))) > 0


def test_fused_rrs_coarse_ie_ladder():
    """The production ie ladder runs 2 doublings coarser than the elastic
    one (ops/fused_rrs.ie_ladder_resolution) — its delta vs the
    full-resolution XLA path must stay well inside the ie accuracy budget
    (~5e-3 of the ie field, PERF.md)."""
    (inputs, config, shifts, w_shifts, Z_r_pp, Z_r_mp, fscatt,
     src_fn) = _setup(STOKES_I)
    ref = rt_solve_rrs(inputs, config, shifts, w_shifts, Z_r_pp, Z_r_mp,
                       fscatt, src_fn=src_fn)
    cfg = dataclasses.replace(config, fused=True, pack=2)
    out = rt_solve_rrs_fused(inputs, cfg, shifts, w_shifts, Z_r_pp,
                             Z_r_mp, fscatt)
    for k in ("ieR", "ieT"):
        a, b = np.asarray(out[k]), np.asarray(ref[k])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30)
        assert rel < 3e-3, (k, rel)


def test_fused_rrs_split3d_mode(ie_fullres):
    """The production dot_mode (split3d ladder + split3 interaction) holds
    the same gate through the block-bichromatic structure."""
    (inputs, config, shifts, w_shifts, Z_r_pp, Z_r_mp, fscatt,
     src_fn) = _setup(STOKES_I, n_spec=32)
    ref = rt_solve_rrs(inputs, config, shifts, w_shifts, Z_r_pp, Z_r_mp,
                       fscatt, src_fn=src_fn)
    cfg = dataclasses.replace(config, fused=True, pack=1,
                              dot_mode="split3d")
    out = rt_solve_rrs_fused(inputs, cfg, shifts, w_shifts, Z_r_pp,
                             Z_r_mp, fscatt)
    for k in ("R", "ieR"):
        a, b = np.asarray(out[k]), np.asarray(ref[k])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30)
        assert rel < 1e-4, (k, rel)
