"""Stage-level timing of the flagship solve on TPU: where do the 34 s go?

Times (a) the full rt_solve, (b) elemental-only (no doubling/interaction),
(c) doubling-only chains, (d) a pure GEMM calibration — with value-fetch
syncs (block_until_ready is unreliable on the axon relay for short work).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_model
from vsmartmom_tpu.core import solver as S
from vsmartmom_tpu.core.types import SolverInputs, stokes_d_vector
import dataclasses


def sync(out):
    return float(jnp.sum(jnp.asarray(jax.tree_util.tree_leaves(out)[0])))


def timeit(fn, *args, reps=2):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n_spec = 1024
    model = _flagship_model(n_spec=n_spec, dtype=np.float32, nstreams=8)
    inputs, config = model.build_band(0)
    print(f"config: N={config.N} nz={config.nz} m_max={config.m_max} "
          f"ndoubl={config.ndoubl} fused={config.fused} pack={config.pack} "
          f"ns_sched={config.ns_sched} ns_inter={config.ns_inter}")
    inputs = jax.device_put(inputs)

    # (a) full solve, fused+packed as configured
    fn = jax.jit(lambda x: S.rt_solve(x, config)["R"])
    print(f"full solve (fused={config.fused}, pack={config.pack}): "
          f"{timeit(fn, inputs)*1e3:9.1f} ms")

    # (a2) full solve, plain XLA path
    cfg_plain = dataclasses.replace(config, fused=False, pack=1)
    fn2 = jax.jit(lambda x: S.rt_solve(x, cfg_plain)["R"])
    print(f"full solve (plain XLA):       {timeit(fn2, inputs)*1e3:9.1f} ms")

    # (b) elemental-only: scan over layers x moments, no doubling/interaction
    dtype = jnp.float32
    d_vec = jnp.asarray(stokes_d_vector(config.n_stokes, config.nquad), dtype)
    qp = inputs.qp_mu_N.astype(dtype)
    wt = inputs.wt_mu_N.astype(dtype)
    mu0 = qp[config.i_mu0_start]
    tau = inputs.tau.astype(dtype)
    scat_w = inputs.scat_w.astype(dtype)
    F0 = inputs.F0.astype(dtype)
    tau_sum = jnp.cumsum(tau, axis=0) - tau   # exclusive cumsum (above layer)
    thermal_b = inputs.thermal_b.astype(dtype)

    @jax.jit
    def elem_all(inputs):
        def moment(acc, xs):
            Z_pp_m, Z_mp_m = xs
            def step(c, ld):
                r, t, jp, jm, ek = S._elemental_and_sources(
                    ld, Z_pp_m=Z_pp_m, Z_mp_m=Z_mp_m, qp_mu_N=qp, wt_mu_N=wt,
                    mu0=mu0, config=config, F0=F0,
                    fourier_w=jnp.asarray(0.25, dtype),
                    is_m0=jnp.asarray(False))
                return c + jnp.sum(r) + jnp.sum(t) + jnp.sum(jp), None
            acc, _ = jax.lax.scan(step, acc,
                                  (tau, scat_w, tau_sum, thermal_b))
            return acc, None
        acc, _ = jax.lax.scan(moment, jnp.zeros((), dtype),
                              (inputs.Z_pp.astype(dtype),
                               inputs.Z_mp.astype(dtype)))
        return acc
    print(f"elemental-only all (m,z):     {timeit(elem_all, inputs)*1e3:9.1f} ms")

    # (d) GEMM calibration: same shapes as the packed fused path
    p = max(config.pack, 1)
    Np = config.N * p
    sp = n_spec // p
    a = jnp.asarray(np.random.default_rng(0).random((sp, Np, Np)), dtype)

    @jax.jit
    def gemm_chain(a):
        x = a
        for _ in range(20):
            x = jax.lax.dot_general(x, a, (((2,), (1,)), ((0,), (0,))),
                                    precision="highest")
            x = x * (1.0 / jnp.max(jnp.abs(x)))
        return x
    dt = timeit(gemm_chain, a)
    fl = 20 * 2 * Np**3 * sp
    print(f"20x batched GEMM ({sp},{Np},{Np}): {dt*1e3:9.1f} ms "
          f"-> {fl/dt/1e12:6.2f} TF/s")

    # big dense GEMM calibration
    b = jnp.asarray(np.random.default_rng(1).random((4096, 4096)), dtype)
    @jax.jit
    def big(b):
        x = b
        for _ in range(8):
            x = jnp.matmul(x, b, precision="highest")
            x = x * (1.0 / jnp.max(jnp.abs(x)))
        return x
    dt = timeit(big, b)
    print(f"8x 4096^3 dense GEMM:         {dt*1e3:9.1f} ms "
          f"-> {8*2*4096**3/dt/1e12:6.2f} TF/s")


if __name__ == "__main__":
    main()
