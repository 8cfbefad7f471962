"""Execution-path parity: packed XLA and fused (interpret) solver paths
must reproduce the plain per-spectral-point path bit-closely.

The fused Pallas + block-diagonal packing combination is the TPU product
path (VERDICT round-2 item 1); on CPU the Pallas kernels run in
interpreter mode with identical semantics, so this suite pins the whole
solver (all moments, surface, postprocessing, hdr/bhr) across paths.
"""

import dataclasses

import numpy as np
import pytest

from vsmartmom_tpu.ops import packing


class TestPacking:
    def test_mat_roundtrip(self):
        rng = np.random.default_rng(0)
        x = rng.random((6, 5, 5)).astype(np.float32)
        packed = packing.pack_mat(x, 2)
        assert packed.shape == (3, 10, 10)
        np.testing.assert_array_equal(packing.unpack_mat(packed, 2), x)

    def test_vec_roundtrip(self):
        rng = np.random.default_rng(1)
        x = rng.random((6, 5, 2)).astype(np.float32)
        packed = packing.pack_vec(x, 3)
        assert packed.shape == (2, 15, 2)
        np.testing.assert_array_equal(packing.unpack_vec(packed, 3), x)

    def test_packed_matmul_is_blockwise(self):
        rng = np.random.default_rng(2)
        a = rng.random((4, 6, 6)).astype(np.float32)
        b = rng.random((4, 6, 6)).astype(np.float32)
        got = packing.unpack_mat(
            np.matmul(packing.pack_mat(a, 2), packing.pack_mat(b, 2)), 2)
        np.testing.assert_allclose(got, np.matmul(a, b), rtol=1e-6)

    def test_pick_pack(self):
        assert packing.pick_pack(52, 1024) == 2
        assert packing.pick_pack(13, 1024) == 8   # 9 !| 1024 -> 8
        assert packing.pick_pack(13, 9 * 7) == 9
        assert packing.pick_pack(130, 64) == 1
        assert packing.pick_pack(52, 1023) == 1   # 2 !| 1023


def _model(n_spec=8, **kw):
    from __graft_entry__ import _flagship_model
    return _flagship_model(n_spec=n_spec, nstreams=4, **kw)


@pytest.fixture(scope="module")
def baseline():
    from vsmartmom_tpu.core.solver import rt_solve
    model = _model()
    inputs, config = model.build_band(0)
    assert config.pack == 1 and not config.fused   # CPU auto-resolution
    return model, inputs, config, rt_solve(inputs, config)


KEYS = ("R", "T", "hdr", "bhr_uw", "bhr_dw")


class TestPathParity:
    def test_packed_xla_matches_plain(self, baseline):
        from vsmartmom_tpu.core.solver import rt_solve
        _, inputs, config, ref = baseline
        cfg = dataclasses.replace(config, pack=2)
        out = rt_solve(inputs, cfg)
        for k in KEYS:
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                       rtol=2e-5, atol=1e-7, err_msg=k)

    def test_fused_interpret_matches_plain(self, baseline):
        from vsmartmom_tpu.core.solver import rt_solve
        _, inputs, config, ref = baseline
        cfg = dataclasses.replace(config, fused=True, pack=2,
                                  ns_sched=(4,) * config.ndoubl, ns_inter=6)
        out = rt_solve(inputs, cfg)
        for k in KEYS:
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                       rtol=5e-5, atol=1e-6, err_msg=k)

    def test_split3d_interpret_matches_plain(self, baseline):
        """The TPU-default dot mode (Beer-diagonal-compensated 3-pass bf16
        splitting, fused_rt._doubling_math_split3d) must hold the same
        parity class as exact-f32 dots: its MXU products only ever touch
        the multiple-scattering ('small') parts, so the bf16 split error
        scales with those, not with the O(1) Beer diagonal."""
        from vsmartmom_tpu.core.solver import rt_solve
        _, inputs, config, ref = baseline
        cfg = dataclasses.replace(config, fused=True, pack=2,
                                  ns_sched=(4,) * config.ndoubl, ns_inter=6,
                                  dot_mode="split3d")
        out = rt_solve(inputs, cfg)
        for k in KEYS:
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                       rtol=1e-4, atol=1e-6, err_msg=k)

    def test_awkward_width_padding(self):
        """Packed widths not divisible by the spectral block (e.g. the
        reference's nSpec=60 operating point -> bp=30) are padded with
        vacuum points inside fused_moment; results must match the plain
        path exactly on the real points."""
        from vsmartmom_tpu.core.solver import rt_solve
        model = _model(n_spec=36)      # bp = 18 -> padded to 24 at block 8
        inputs, config = model.build_band(0)
        ref = rt_solve(inputs, config)
        cfg = dataclasses.replace(config, fused=True, pack=2,
                                  ns_sched=(4,) * config.ndoubl, ns_inter=6)
        out = rt_solve(inputs, cfg)
        for k in KEYS:
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                       rtol=5e-5, atol=1e-6, err_msg=k)

    def test_moment_split_matches_full(self, baseline):
        """Moments above m_scat (surface-only: Cox-Munk pushes m_max to the
        stream cap, Rayleigh scatters only to m = 2) must be exactly
        reproduced by the diagonal Beer-law shortcut."""
        from vsmartmom_tpu.core.solver import rt_solve
        _, inputs, config, ref = baseline
        assert 0 <= config.m_scat < config.m_max   # split active by default
        cfg_full = dataclasses.replace(config, m_scat=config.m_max)
        out = rt_solve(inputs, cfg_full)
        for k in KEYS:
            np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(out[k]),
                                       rtol=2e-5, atol=1e-7, err_msg=k)

    def test_moment_split_streams(self, baseline):
        from vsmartmom_tpu.core.solver import rt_solve
        _, inputs, config, _ = baseline
        cfg_s = dataclasses.replace(config, save_streams=True)
        cfg_f = dataclasses.replace(config, save_streams=True,
                                    m_scat=config.m_max)
        a, b = rt_solve(inputs, cfg_s), rt_solve(inputs, cfg_f)
        for k in ("J_up_per_m", "J_dn_per_m"):
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=2e-5, atol=1e-7, err_msg=k)

    def test_ns_schedule_probe_is_safe(self, baseline):
        """The scene-derived schedule must reproduce the worst-case result."""
        from vsmartmom_tpu.core.solver import rt_solve
        model, inputs, config, ref = baseline
        import jax

        # Re-derive the schedule the way build_band would on TPU.
        from vsmartmom_tpu.core.model import Parameters  # noqa: F401
        from vsmartmom_tpu.ops.ns_schedule import probe_ns_schedule
        from vsmartmom_tpu.core.types import stokes_d_vector
        scat_w = np.asarray(inputs.tau * 0)  # placeholder; probe via model
        s_star = int(np.argmax(np.asarray(inputs.scat_w).sum(axis=1)
                               .max(axis=0)))
        tau_p = np.asarray(inputs.tau)[:, s_star]
        safe_tau = np.where(tau_p > 0, tau_p, 1.0)
        wZ_pp = np.einsum("zc,cij->zij",
                          np.asarray(inputs.scat_w)[:, :, s_star],
                          np.asarray(inputs.Z_pp)[0]) / safe_tau[:, None, None]
        wZ_mp = np.einsum("zc,cij->zij",
                          np.asarray(inputs.scat_w)[:, :, s_star],
                          np.asarray(inputs.Z_mp)[0]) / safe_tau[:, None, None]
        d_vec = stokes_d_vector(config.n_stokes, config.nquad)
        sched, inter = probe_ns_schedule(
            wZ_pp, wZ_mp, tau_p, np.asarray(inputs.qp_mu_N),
            np.asarray(inputs.wt_mu_N), d_vec, config.ndoubl,
            surf_r=np.asarray(inputs.surf_r)[0]
            * float(np.max(np.asarray(inputs.surf_spec))))
        assert len(sched) == config.ndoubl
        # 0 = seed-only (I + S) steps, scheduled when rho^2 < tol
        assert all(0 <= k <= 12 for k in sched)

        cfg = dataclasses.replace(config, fused=True, pack=2,
                                  ns_sched=sched, ns_inter=inter)
        out = rt_solve(inputs, cfg)
        for k in KEYS:
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                       rtol=5e-5, atol=1e-6, err_msg=k)
