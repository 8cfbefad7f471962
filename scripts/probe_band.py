"""Compile/parity/speed probe for ops/fused_band.fused_moment on TPU.

Parity: compare against interpret=True on small shapes with physical
(energy-conserving) inputs. Speed: bench-like shapes (s=512, N=52, pack=2,
nz=33, 3 moments equivalent -> time one moment).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from vsmartmom_tpu.ops.fused_band import fused_moment


def make_inputs(rng, nz, s, C, N, n_stokes, ndoubl, dtype=np.float32):
    qp = np.sort(rng.uniform(0.2, 1.0, N // n_stokes))
    qp_mu_N = np.repeat(qp, n_stokes)
    wt = rng.uniform(0.05, 0.2, N // n_stokes)
    wt_mu_N = np.repeat(wt, n_stokes)
    i_mu0_start = (N // n_stokes // 2) * n_stokes
    mu0 = qp_mu_N[i_mu0_start]

    tau = rng.uniform(0.01, 0.5, (nz, s))
    ssa = rng.uniform(0.3, 0.95, (nz, s))
    scat_w = (tau * ssa)[:, None, :] * np.ones((1, C, 1))
    scat_w = scat_w / C
    Z = rng.uniform(0.0, 0.3, (C, N, N)) / N  # small, energy-safe
    Zpp = Z.astype(dtype)
    Zmp = (Z * 0.8).astype(dtype)

    dtau = tau / 2.0 ** ndoubl
    Em1 = np.expm1(-dtau[:, :, None] / qp_mu_N[None, None, :])
    Em10 = np.expm1(-dtau / mu0)
    tau_sum = np.concatenate([np.zeros((1, s)), np.cumsum(tau, 0)])[:nz]
    att = np.exp(-tau_sum / mu0)
    ek = np.exp(-dtau / mu0)
    thermal = np.zeros((nz, s))
    F0 = np.zeros((n_stokes, s)); F0[0] = 1.0
    d_vec = np.ones(N)
    if n_stokes > 1:
        d = np.ones(n_stokes); d[2:] = -1.0
        d_vec = np.tile(d, N // n_stokes)
    is_I = (np.arange(N) % n_stokes == 0).astype(np.float64)
    in_blk = np.zeros(N); in_blk[i_mu0_start:i_mu0_start + n_stokes] = 1.0
    args = [Zpp, Zmp, tau, scat_w, Em1, Em10, att, ek, thermal, F0,
            qp_mu_N, wt_mu_N, d_vec, is_I, in_blk]
    args = [jnp.asarray(a, dtype) for a in args]
    return args, i_mu0_start


def main():
    rng = np.random.default_rng(0)
    n_stokes = 4
    # small parity case
    N, s, nz, C, ndoubl, pack = 12, 32, 4, 2, 4, 2
    args, i0 = make_inputs(rng, nz, s, C, N, n_stokes, ndoubl)
    kw = dict(ndoubl=ndoubl, ns_sched=(1, 1, 2, 2), ns_inter=3, pack=pack,
              n_stokes=n_stokes, i_mu0_start=i0, n_sources=1)
    ref = fused_moment(*args, interpret=True, **kw)
    try:
        out = jax.jit(lambda *a: fused_moment(*a, interpret=False, **kw))(*args)
        errs = [float(jnp.max(jnp.abs(o - r))) for o, r in zip(out, ref)]
        print("parity max abs err:", max(errs), errs)
    except Exception as e:
        print("COMPILE/RUN FAIL (small):")
        print(str(e)[:3000])
        return

    # bench-shape speed
    N, s, nz, C, ndoubl, pack = 52, 512, 33, 2, 8, 2
    args, i0 = make_inputs(rng, nz, s, C, N, n_stokes, ndoubl)
    kw = dict(ndoubl=ndoubl, ns_sched=(1, 1, 1, 1, 2, 2, 2, 2), ns_inter=3,
              pack=pack, n_stokes=n_stokes, i_mu0_start=i0, n_sources=1)
    f = jax.jit(lambda *a: fused_moment(*a, interpret=False, **kw))
    try:
        out = f(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print("COMPILE/RUN FAIL (bench shape):")
        print(str(e)[:3000])
        return
    n_rep = 30
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_rep
    print(f"one moment ({nz} layers, s={s}): {dt*1e3:.2f} ms "
          f"-> 3 moments ~ {3*dt*1e3:.1f} ms, {s/(3*dt):.0f} pts/s")


if __name__ == "__main__":
    main()
