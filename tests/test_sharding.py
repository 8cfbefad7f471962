"""Multi-device spectral-sharding correctness (SURVEY.md section 2.10).

Runs on the 8 virtual CPU devices configured in conftest.py — the same XLA
program that compiles for a real TPU mesh. Asserts sharded == unsharded for
the forward solve, the linearized (jvp) solve, and the inelastic RRS solve
(whose ``jnp.roll`` over the sharded spectral axis lowers to a cross-device
collective permute — the halo exchange of SURVEY section 5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _flagship_model
from vsmartmom_tpu.core.solver import rt_solve
from vsmartmom_tpu.parallel.sharding import (pad_to_multiple, shard_inputs,
                                             spectral_mesh)

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    devices = jax.devices()
    if len(devices) < N_DEV:
        pytest.skip(f"need {N_DEV} devices, have {len(devices)}")
    return spectral_mesh(devices[:N_DEV])


class TestForwardSharded:
    def test_forward_sharded_equals_unsharded(self, mesh):
        n_spec = 4 * N_DEV
        model = _flagship_model(n_spec=n_spec, nstreams=4, nz=4,
                                dtype=np.float64)
        inputs, config = model.build_band(0)

        fn = jax.jit(lambda x: rt_solve(x, config)["R"])
        ref = np.asarray(fn(inputs))

        sharded = shard_inputs(inputs, mesh)
        out = fn(sharded)
        # spectral axis (last) must actually be distributed
        assert len(out.sharding.device_set) == N_DEV
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12,
                                   atol=1e-14)

    def test_all_outputs_sharded(self, mesh):
        n_spec = 2 * N_DEV
        model = _flagship_model(n_spec=n_spec, nstreams=4, nz=3,
                                dtype=np.float64)
        inputs, config = model.build_band(0)
        fn = jax.jit(lambda x: rt_solve(x, config))
        ref = jax.tree.map(np.asarray, fn(inputs))
        out = fn(shard_inputs(inputs, mesh))
        for k in ("R", "T", "hdr", "bhr_uw", "bhr_dw"):
            np.testing.assert_allclose(np.asarray(out[k]), ref[k],
                                       rtol=1e-12, atol=1e-14, err_msg=k)

    def test_pad_to_multiple(self):
        assert pad_to_multiple(17, 8) == 24
        assert pad_to_multiple(16, 8) == 16


class TestLinearizedSharded:
    def test_jvp_sharded_equals_unsharded(self, mesh):
        """Tangent solve (the linearized path is jvp through rt_solve) under
        spectral sharding: perturb tau."""
        n_spec = 2 * N_DEV
        model = _flagship_model(n_spec=n_spec, nstreams=4, nz=3,
                                dtype=np.float64)
        inputs, config = model.build_band(0)
        dtau = jnp.ones_like(inputs.tau)

        def f(tau):
            import dataclasses
            return rt_solve(dataclasses.replace(inputs, tau=tau), config)["R"]

        fwd = jax.jit(lambda t, dt: jax.jvp(f, (t,), (dt,)))
        R_ref, dR_ref = jax.tree.map(np.asarray, fwd(inputs.tau, dtau))

        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P(None, "spectral"))
        R_s, dR_s = fwd(jax.device_put(inputs.tau, sh),
                        jax.device_put(dtau, sh))
        assert len(R_s.sharding.device_set) == N_DEV
        np.testing.assert_allclose(np.asarray(R_s), R_ref, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(dR_s), dR_ref, rtol=1e-11,
                                   atol=1e-14)


class TestRamanSharded:
    def test_rrs_sharded_equals_unsharded(self, mesh):
        """RRS redistribution rolls the spectral axis; under sharding the
        roll crosses shard boundaries (collective permute). The result must
        be identical to the single-device run."""
        from vsmartmom_tpu import model_from_parameters
        from vsmartmom_tpu.core.inelastic import rt_solve_rrs, _roll0
        from vsmartmom_tpu.core.model import Parameters, SurfaceDescriptor
        from vsmartmom_tpu.inelastic.rrs_setup import (greek_raman,
                                                       rrs_redistribution)
        from vsmartmom_tpu.scattering.stokes import STOKES_I
        from vsmartmom_tpu.scattering.zmatrix import compute_Z_moments

        nu = np.arange(12950.0, 13200.0, 2.0)   # 125 pts -> pad to 128
        n_pad = pad_to_multiple(len(nu), N_DEV)
        nu = np.concatenate([nu, nu[-1] + 2.0 * np.arange(1, n_pad - len(nu) + 1)])
        params = Parameters(
            spec_bands=[nu],
            surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [0.2])],
            nstreams=4, polarization=STOKES_I,
            sza=45.0, vza=[0.0, 40.0], vaz=[0.0, 90.0], obs_alt=0.0,
            T=np.array([250.0, 275.0]), p=np.array([100.0, 500.0, 1013.0]),
            depol=-1.0)
        model = model_from_parameters(params)
        band = model.bands[0]
        inputs, config = model.build_band(0, rrs=True)

        shifts, w_shifts, _ = rrs_redistribution(band.nu_grid)
        w_shifts = w_shifts * (1.0 - band.pi_cabannes) / w_shifts.sum()
        # keep the test fast: strongest 12 lines only
        top = np.argsort(w_shifts)[-12:]
        shifts, w_shifts = shifts[top], w_shifts[top]

        pol = model.params.polarization
        gk_r = greek_raman()
        n_m = config.m_max + 1
        Z_r = [compute_Z_moments(pol, model.quad.qp_mu, gk_r, m)
               for m in range(n_m)]
        Z_r_pp = np.stack([z[0] for z in Z_r])
        Z_r_mp = np.stack([z[1] for z in Z_r])
        tau_rayl = band.tau_rayl.T                       # (Nz, nSpec)
        fscatt = tau_rayl / np.maximum(np.asarray(inputs.tau), 1e-300)

        args = (tuple(int(v) for v in shifts), jnp.asarray(w_shifts),
                jnp.asarray(Z_r_pp), jnp.asarray(Z_r_mp),
                jnp.asarray(fscatt))

        out_ref = jax.tree.map(
            np.asarray, rt_solve_rrs(inputs, config, *args, src_fn=_roll0))

        sharded = shard_inputs(inputs, mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P
        fscatt_s = jax.device_put(args[4], NamedSharding(mesh, P(None, "spectral")))
        out_s = rt_solve_rrs(sharded, config, args[0], args[1], args[2],
                             args[3], fscatt_s, src_fn=_roll0)
        assert len(out_s["ieR"].sharding.device_set) == N_DEV
        for k in ("R", "T", "ieR", "ieT"):
            np.testing.assert_allclose(np.asarray(out_s[k]), out_ref[k],
                                       rtol=5e-6, atol=1e-12, err_msg=k)
