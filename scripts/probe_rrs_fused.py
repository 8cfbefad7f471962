"""Stage breakdown of the fused RRS solve: kernel vs XLA prep vs surface
ie_interaction — targets the round-5 optimization of ops/fused_rrs.py."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from bench_rrs import _model  # noqa: E402
from vsmartmom_tpu.core.inelastic import (_comp_dict, _add_dict,  # noqa: E402
                                          ie_added_zero, ie_interaction,
                                          inelastic_setup, rt_solve_rrs_fused)
from vsmartmom_tpu.core.types import stokes_d_vector  # noqa: E402


def t(fn, *a, reps=3, label=""):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:40s} {dt:8.1f} ms", flush=True)
    return out, dt


def main(n_spec=256):
    model = _model(n_spec)
    (inputs, config, shifts, w_shifts, Z_r_pp, Z_r_mp, fscatt,
     src_fn) = inelastic_setup(model)
    print(f"nSpec={n_spec} nR={len(shifts)} nz={config.nz} N={config.N} "
          f"ndoubl={config.ndoubl} ns_sched={config.ns_sched} "
          f"ns_inter={config.ns_inter} pack={config.pack}", flush=True)
    dtype = jnp.dtype(config.dtype)
    N = config.N
    ns = config.n_stokes

    # full solve
    full = jax.jit(lambda i: rt_solve_rrs_fused(i, config, shifts, w_shifts,
                                                Z_r_pp, Z_r_mp, fscatt))
    out, dt_full = t(full, inputs, label="full rt_solve_rrs_fused")
    del out

    # one-moment ie kernel (incl. its XLA prep)
    from vsmartmom_tpu.core.kernels import _exp, _expm1
    qp = inputs.qp_mu_N.astype(dtype)
    wt = inputs.wt_mu_N.astype(dtype)
    mu0 = qp[config.i_mu0_start]
    d_vec = jnp.asarray(stokes_d_vector(ns, config.nquad), dtype)
    tau = inputs.tau.astype(dtype)
    scat_w = inputs.scat_w.astype(dtype)
    tau_sum = jnp.concatenate([jnp.zeros((1, n_spec), dtype),
                               jnp.cumsum(tau, axis=0)], axis=0)
    dtau_z = tau / (2.0 ** config.ndoubl)
    Em1 = _expm1(-dtau_z[:, :, None] / qp[None, None, :])
    Em10 = _expm1(-dtau_z / mu0)
    att = _exp(-tau_sum[:config.nz] / mu0)
    ek = _exp(-dtau_z / mu0)
    idx = jnp.arange(N)
    in_blk = (((idx >= config.i_mu0_start)
               & (idx < config.i_mu0_start + ns))
              | (jnp.abs(qp - mu0) <= 1e-9 * mu0)).astype(dtype)
    F0 = inputs.F0.astype(dtype)

    from vsmartmom_tpu.ops.fused_rrs import fused_moment_rrs

    def one_moment(Zpp, Zmp, Zrpp, Zrmp):
        return fused_moment_rrs(
            Zpp, Zmp, Zrpp, Zrmp, tau, scat_w, Em1, Em10, att, ek,
            fscatt.astype(dtype), shifts, w_shifts.astype(dtype), F0 * 0.5,
            qp, 0.5 * wt, d_vec, in_blk, ndoubl=config.ndoubl,
            ns_sched=config.ns_sched or None, ns_inter=config.ns_inter,
            n_stokes=ns, i_mu0_start=config.i_mu0_start,
            block=config.band_block, dot_mode=config.dot_mode)

    om = jax.jit(lambda *z: [a.sum() for a in one_moment(*z)])
    Z0 = (inputs.Z_pp.astype(dtype)[0], inputs.Z_mp.astype(dtype)[0],
          Z_r_pp.astype(dtype)[0], Z_r_mp.astype(dtype)[0])
    ie_out, dt_mom = t(om, *Z0, label="one fused_moment_rrs (kernel+prep)")
    del ie_out

    # prep only: same function but returning before the pallas_call —
    # approximate by timing the rolled-table construction standalone.
    from vsmartmom_tpu.ops.fused_rrs import _roll_stack

    def prep_only(Zpp, Zmp):
        safe_tau = jnp.where(tau > 0, tau, 1.0)
        w_over = scat_w / safe_tau[:, None, :]
        (w0,) = _roll_stack((w_over,), shifts, axis=2)
        (e0, j0a, j0b) = _roll_stack((Em1, Em1, Em1), shifts, axis=1)
        (d0, ek0, f0, em00, at0) = _roll_stack(
            (dtau_z, ek, fscatt.astype(dtype), Em10, att), shifts, axis=1)
        return (w0.sum(), e0.sum(), j0a.sum(), j0b.sum(), d0.sum(),
                ek0.sum(), f0.sum(), em00.sum(), at0.sum())

    po = jax.jit(prep_only)
    _, dt_prep = t(po, Z0[0], Z0[1], label="rolled-table construction only")

    # surface ie_interaction at these shapes
    nR = len(shifts)
    key = jax.random.PRNGKey(0)
    rnd = lambda *s: 0.01 * jax.random.normal(key, s, dtype)  # noqa: E731
    comp_el = {k: rnd(n_spec, N, N) for k in
               ("R_mp", "R_pm", "T_pp", "T_mm")}
    comp_el.update({k: rnd(n_spec, N) for k in ("J0_p", "J0_m")})
    add_el = {k: rnd(n_spec, N, N) for k in
              ("r_mp", "r_pm", "t_pp", "t_mm")}
    add_el.update({k: rnd(n_spec, N) for k in ("j0_p", "j0_m")})
    comp_ie = tuple(rnd(nR, n_spec, N, N) for _ in range(4)) + \
        tuple(rnd(nR, n_spec, N) for _ in range(2))
    add_ie0 = ie_added_zero(nR, n_spec, N, dtype)

    from vsmartmom_tpu.core.inelastic import IEComposite
    si = jax.jit(lambda c, a, ci: ie_interaction(c, a, IEComposite(*ci),
                                                 add_ie0, shifts))
    _, dt_surf = t(si, comp_el, add_el, comp_ie,
                   label="surface ie_interaction (XLA)")

    n_m = config.m_max + 1
    print(f"\nmodel: {n_m} x moment({dt_mom:.0f}) + {n_m} x "
          f"surf({dt_surf:.0f}) = {n_m * (dt_mom + dt_surf):.0f} "
          f"vs full {dt_full:.0f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
