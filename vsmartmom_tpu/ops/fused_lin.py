"""Multitangent (linearize-split) band kernel for Jacobian runs.

rt_run_lin previously paid one full jvp solve per parameter: pallas's
automatic JVP generates a combined primal+tangent kernel, so an
8-parameter Jacobian stack recomputed the primal ladder 8 times
(VERDICT r4 residual #2). This module runs ONE kernel per Fourier moment
that computes the primal ladder once and replays P parameter tangents
against its residuals, by calling ``jax.linearize`` on the shared pure
step function (fused_band._moment_body) INSIDE the kernel body — the
partial evaluation happens at trace time, so the Mosaic kernel contains
one primal chain whose intermediates feed all P tangent chains. This is
the TPU-native equivalent of the reference's hand-written all-parameter
kernels (elemental_lin.jl:456-602 get_elem_rt_*_fused!,
doubling_lin.jl:79-475 doubling_allparams! — one forward pass carrying
Nparams derivative slabs), except the tangent algebra is machine-derived
from the same body as the forward kernel and can never drift from it.

Tangent operand layout (Mosaic block ranks stay <= 4): the parameter
axis folds into existing leading dims — dZ as (P*C, Np, Np), per-layer
tangent row tables as (nz, P, bp, Np) — and tangent outputs stack as
(P, bp, Np, Np). K = 1 (solar-only) scenes only, which is every
linearized BASELINE configuration.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_band import _geom_tables, _moment_body, band_operands
from .fused_rt import _norm_sched

#: Set to True the first time the MT kernel fails to compile in this
#: process (some toolchains' remote-compile helper crashes on the kernel
#: after ~12 min) so later callers skip straight to the jvp fallback
#: instead of re-paying the failed compile (bench.py runs rt_run_lin and
#: the lin bench in one process).
MT_BROKEN = False


def _mt_dot_mode(config_mode: str) -> str:
    """In-kernel dot mode for the MT kernel: default "highest".

    split3d emits splits + 3 dot ops PER PRODUCT into the unrolled Mosaic
    program; with a primal + mt_chunk tangent chains the program text is
    ~4x the forward kernel's and this tunnel's remote-compile helper
    crashes on it (subprocess exit 1). One precision="highest" dot op per
    product keeps the program a third the size (Mosaic expands the 6
    bf16 passes internally, not in the program), is BIT-exact (tighter
    than split3d), and measured only ~1.2x slower per dot (PERF.md
    round-4 precision table) — the MT restructure's ~(1+P)/2P win
    dominates. VSM_MT_DOT overrides (e.g. back to the config mode)."""
    import os
    return os.environ.get("VSM_MT_DOT", "highest") or config_mode

_I0 = np.int32(0)


def _mt_kernel(Zpp_ref, Zmp_ref, geom_ref, zflag_ref, wrow_ref, Em1_ref,
               dt_ref, jp_ref, jms_ref, ekr_ref,
               dZpp_ref, dZmp_ref, dwrow_ref, dEm1_ref, ddt_ref,
               djp_ref, djms_ref, dekr_ref,
               Rmp_o, Rpm_o, Tpp_o, Tmm_o, Jp_o, Jm_o,
               tRmp_o, tRpm_o, tTpp_o, tTmm_o, tJp_o, tJm_o,
               *, nz, ns_sched, ns_inter, dot_mode, n_tan, n_comp):
    dtype = Zpp_ref.dtype
    bp, Np = Em1_ref.shape[1], Em1_ref.shape[2]
    first = zflag_ref[0, 0, 0] > 0.5
    C = n_comp

    from .fused_band import _EYE
    eye = geom_ref[_EYE][None]
    zero_m = jnp.zeros((bp, Np, Np), dtype)
    zero_v = jnp.zeros((bp, Np, 1), dtype)
    Rmp_c = jnp.where(first, zero_m, Rmp_o[:])
    Rpm_c = jnp.where(first, zero_m, Rpm_o[:])
    Tpp_c = jnp.where(first, eye + zero_m, Tpp_o[:])
    Tmm_c = jnp.where(first, eye + zero_m, Tmm_o[:])
    Jp_c = jnp.where(first, zero_v, Jp_o[:][..., None])
    Jm_c = jnp.where(first, zero_v, Jm_o[:][..., None])

    # remat_assembly stays OFF: jax.checkpoint inside the kernel body
    # trips an MLIR lowering-cache KeyError on this jax version (the
    # closed_call wrapping of the rematerialized kron); VMEM is held by
    # the 100M scoped limit instead.
    body = partial(_moment_body, geom=geom_ref[:], ns_sched=ns_sched,
                   ns_inter=ns_inter, dot_mode=dot_mode)
    prim = (Zpp_ref[:], Zmp_ref[:], wrow_ref[0], Em1_ref[0], dt_ref[0],
            jp_ref[0][..., None], jms_ref[0][..., None],
            ekr_ref[0][..., None], Rmp_c, Rpm_c, Tpp_c, Tmm_c, Jp_c, Jm_c)
    out, lin = jax.linearize(body, *prim)
    for ref, val in zip((Rmp_o, Rpm_o, Tpp_o, Tmm_o), out[:4]):
        ref[:] = val
    Jp_o[:] = out[4][..., 0]
    Jm_o[:] = out[5][..., 0]

    dZpp = dZpp_ref[:]
    dZmp = dZmp_ref[:]
    dwrow = dwrow_ref[0]
    dEm1 = dEm1_ref[0]
    ddt = ddt_ref[0]
    djp = djp_ref[0]
    djms = djms_ref[0]
    dekr = dekr_ref[0]
    for q in range(n_tan):
        tRmp_c = jnp.where(first, zero_m, tRmp_o[q])
        tRpm_c = jnp.where(first, zero_m, tRpm_o[q])
        tTpp_c = jnp.where(first, zero_m, tTpp_o[q])
        tTmm_c = jnp.where(first, zero_m, tTmm_o[q])
        tJp_c = jnp.where(first, zero_v, tJp_o[q][..., None])
        tJm_c = jnp.where(first, zero_v, tJm_o[q][..., None])
        douts = lin(dZpp[q * C:(q + 1) * C], dZmp[q * C:(q + 1) * C],
                    dwrow[q * C:(q + 1) * C], dEm1[q], ddt[q],
                    djp[q][..., None], djms[q][..., None],
                    dekr[q][..., None],
                    tRmp_c, tRpm_c, tTpp_c, tTmm_c, tJp_c, tJm_c)
        for ref, val in zip((tRmp_o, tRpm_o, tTpp_o, tTmm_o), douts[:4]):
            ref[q] = val
        tJp_o[q] = douts[4][..., 0]
        tJm_o[q] = douts[5][..., 0]


def fused_moment_multitangent(ops, dops, geom, qp_mu_N, *, nz, ns_sched,
                              ns_inter, ndoubl, block=8, interpret=None,
                              dot_mode="highest"):
    """One Fourier moment, primal + P tangents, one kernel launch.

    ops: the band_operands tuple (K = 1 layout); dops: list of P tangent
    tuples of the same structure (from jax.linearize of band_operands).
    Returns (primal composite tuple, tangent composite tuple with leading
    P axis) — matrices (bp, Np, Np)/(P, bp, Np, Np), sources (bp, Np)
    without the K axis.
    """
    Zbd_pp, Zbd_mp, wrow, Em1p, dtp, j0_p, jm_star, ekr = ops
    nz_, C, bp_tot, Np = wrow.shape
    dtype = Zbd_pp.dtype
    P = len(dops)
    ns_sched = _norm_sched(ns_sched, ndoubl)
    if dtype != jnp.float32 and "split" in dot_mode:
        dot_mode = "highest"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    dZpp = jnp.concatenate([d[0] for d in dops], axis=0)     # (P C, Np, Np)
    dZmp = jnp.concatenate([d[1] for d in dops], axis=0)
    dwrow = jnp.concatenate([d[2] for d in dops], axis=1)    # (nz, P C, ...)
    dEm1 = jnp.stack([d[3] for d in dops], axis=1)           # (nz, P, ...)
    ddt = jnp.stack([d[4] for d in dops], axis=1)
    djp = jnp.stack([d[5] for d in dops], axis=1)
    djms = jnp.stack([d[6] for d in dops], axis=1)
    dekr = jnp.stack([d[7] for d in dops], axis=1)

    bb = bp_tot if bp_tot <= block else block
    bp_pad = bp_tot
    tables = dict(wrow=wrow, Em1p=Em1p, dtp=dtp, j0_p=j0_p,
                  jm_star=jm_star, ekr=ekr, dwrow=dwrow, dEm1=dEm1,
                  ddt=ddt, djp=djp, djms=djms, dekr=dekr)
    if bp_tot > block and bp_tot % bb:
        bp_pad = ((bp_tot + bb - 1) // bb) * bb
        padn = bp_pad - bp_tot

        def padp(x, axis, value=0.0):
            widths = [(0, 0)] * x.ndim
            widths[axis] = (0, padn)
            return jnp.pad(x, widths, constant_values=value)
        for k in tables:
            axis = 2 if k in ("wrow", "dwrow", "dEm1", "ddt", "djp",
                              "djms", "dekr") else 1
            tables[k] = padp(tables[k], axis,
                             1.0 if k == "ekr" else 0.0)
    grid = (bp_pad // bb, nz)

    def vmem(shape):
        return pl.BlockSpec(shape, lambda i, z: (_I0,) * len(shape),
                            memory_space=pltpu.VMEM)

    zflag = jnp.zeros((nz, 8, 128), dtype).at[0].set(1.0)
    row = pl.BlockSpec((1, bb, Np), lambda i, z: (z, i, _I0),
                       memory_space=pltpu.VMEM)
    rowC = pl.BlockSpec((1, C, bb, Np), lambda i, z: (z, _I0, i, _I0),
                        memory_space=pltpu.VMEM)
    rowPC = pl.BlockSpec((1, P * C, bb, Np), lambda i, z: (z, _I0, i, _I0),
                         memory_space=pltpu.VMEM)
    rowP = pl.BlockSpec((1, P, bb, Np), lambda i, z: (z, _I0, i, _I0),
                        memory_space=pltpu.VMEM)
    in_specs = [
        vmem((C, Np, Np)), vmem((C, Np, Np)), vmem((geom.shape[0], Np, Np)),
        pl.BlockSpec((1, 8, 128), lambda i, z: (z, _I0, _I0),
                     memory_space=pltpu.VMEM),
        rowC, row, row, row, row, row,
        vmem((P * C, Np, Np)), vmem((P * C, Np, Np)),
        rowPC, rowP, rowP, rowP, rowP, rowP,
    ]
    mat_o = pl.BlockSpec((bb, Np, Np), lambda i, z: (i, _I0, _I0),
                         memory_space=pltpu.VMEM)
    vec_o = pl.BlockSpec((bb, Np), lambda i, z: (i, _I0),
                         memory_space=pltpu.VMEM)
    tmat_o = pl.BlockSpec((P, bb, Np, Np), lambda i, z: (_I0, i, _I0, _I0),
                          memory_space=pltpu.VMEM)
    tvec_o = pl.BlockSpec((P, bb, Np), lambda i, z: (_I0, i, _I0),
                          memory_space=pltpu.VMEM)
    out_shapes = (
        (jax.ShapeDtypeStruct((bp_pad, Np, Np), dtype),) * 4
        + (jax.ShapeDtypeStruct((bp_pad, Np), dtype),) * 2
        + (jax.ShapeDtypeStruct((P, bp_pad, Np, Np), dtype),) * 4
        + (jax.ShapeDtypeStruct((P, bp_pad, Np), dtype),) * 2)

    kernel = partial(_mt_kernel, nz=nz, ns_sched=ns_sched,
                     ns_inter=ns_inter, dot_mode=dot_mode, n_tan=P,
                     n_comp=C)
    fn = pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs,
        out_specs=(mat_o,) * 4 + (vec_o,) * 2
        + (tmat_o,) * 4 + (tvec_o,) * 2,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    out = fn(Zbd_pp, Zbd_mp, geom, zflag, tables["wrow"], tables["Em1p"],
             tables["dtp"], tables["j0_p"], tables["jm_star"],
             tables["ekr"], dZpp, dZmp, tables["dwrow"], tables["dEm1"],
             tables["ddt"], tables["djp"], tables["djms"],
             tables["dekr"])
    if bp_pad != bp_tot:
        return (tuple(o[:bp_tot] for o in out[:6]),
                tuple(o[:, :bp_tot] for o in out[6:]))
    return out[:6], out[6:]


def rt_solve_multitangent(inputs, tangents, config, mt_chunk=2):
    """Forward solve + P parameter tangents with the primal ladder run
    ONCE per chunk of mt_chunk tangents (vs once per parameter with the
    jvp path). Fused/K=1 configurations; every Fourier moment runs the
    full ladder (the Beer-shortcut split is exact either way — see
    solver.rt_solve — so parity with rt_solve holds; Jacobian scenes have
    aerosols driving m_scat to the cap anyway).

    tangents: list of SolverInputs-shaped tangent pytrees.
    Returns (R, T, dR (P, nvza, ns, s), dT).
    """
    import dataclasses  # noqa: F401

    from ..core.kernels import _exp, _expm1, interaction
    from ..core.types import stokes_d_vector
    from ..core.solver import _surface_layer
    from .packing import pack_mat, pack_vec, unpack_vec
    from ..core.kernels import AddedLayer, CompositeLayer

    assert config.n_sources == 1, "multitangent path is solar-only (K=1)"
    dtype = jnp.dtype(config.dtype)
    n_spec, N, nz = config.n_spec, config.N, config.nz
    ns = config.n_stokes
    p = config.pack
    P_all = len(tangents)

    qp_mu_N = inputs.qp_mu_N.astype(dtype)
    wt_mu_N = inputs.wt_mu_N.astype(dtype)
    mu0 = qp_mu_N[config.i_mu0_start]
    d_vec = jnp.asarray(stokes_d_vector(ns, config.nquad), dtype)
    idx = jnp.arange(N)
    is_I_vec = ((idx % ns) == 0).astype(dtype)
    in_blk_vec = (((idx >= config.i_mu0_start)
                   & (idx < config.i_mu0_start + ns))
                  | (jnp.abs(qp_mu_N - mu0) <= 1e-9 * mu0)).astype(dtype)

    tau = inputs.tau.astype(dtype)
    scat_w = inputs.scat_w.astype(dtype)
    F0 = inputs.F0.astype(dtype)
    surf_spec = inputs.surf_spec.astype(dtype)
    sif0 = inputs.sif_spec.astype(dtype)

    nvza = len(config.vza_idx)
    vza_rows = np.asarray(
        [[v * ns + k for k in range(ns)] for v in config.vza_idx])
    n_m = config.m_max + 1
    fourier_w = jnp.asarray([0.5] + [0.25] * (n_m - 1), dtype)
    geom = _geom_tables(qp_mu_N.astype(dtype), wt_mu_N.astype(dtype) * 1.0,
                        d_vec.astype(dtype), p, dtype)
    # geom's wct rows carry the fourier factor in fused_moment; here the
    # fourier weight is folded into wrow/F0_m instead so ONE geom serves
    # every moment — the _RG/_TO/_TS tables must then stay UNWEIGHTED and
    # the weight multiplies wrow (w_c/tau) and F0_m, which is algebraically
    # identical (both r and t are linear in wct and in wZ).

    def precursors(tau_):
        tau_sum = jnp.concatenate(
            [jnp.zeros((1, n_spec), dtype), jnp.cumsum(tau_, axis=0)],
            axis=0)
        dtau_z = tau_ / (2.0 ** config.ndoubl)
        Em1 = _expm1(-dtau_z[:, :, None] / qp_mu_N[None, None, :])
        Em1_0 = _expm1(-dtau_z / mu0)
        att = _exp(-tau_sum[:nz] / mu0)
        ek = _exp(-dtau_z / mu0)
        return Em1, Em1_0, att, ek, tau_sum[nz]

    pre, lin_pre = jax.linearize(precursors, tau)
    Em1_pre, Em10_pre, att_pre, ek_pre, tau_boa = pre
    d_pre = [lin_pre(d.tau.astype(dtype)) for d in tangents]

    thermal0 = jnp.zeros_like(tau)
    sched = config.ns_sched or None

    def run_chunk(tan_idx):
        Pc = len(tan_idx)

        def moment_body(carry, xs):
            R, T, dR, dT = carry
            (Z_pp_m, Z_mp_m, surf_r_m, surf_j_m, direct_m, vza_w_m, fw,
             is_m0, dZ_pp_m, dZ_mp_m, dsurf_r_m, dsurf_j_m) = xs

            def prep(Zp, Zm, tau_, sw, Em1_, Em10_, att_, ek_, F0m):
                return band_operands(
                    Zp, Zm, tau_, sw, Em1_, Em10_, att_, ek_, thermal0,
                    F0m, qp_mu_N, d_vec, is_I_vec, in_blk_vec,
                    ndoubl=config.ndoubl, pack=p, n_stokes=ns,
                    i_mu0_start=config.i_mu0_start, n_sources=1)

            # The fourier weight folds into scat_w ALONE (see geom note
            # above): matrices are linear in the wZ x wct product, and
            # the solar sources pick fw up through w_over — F0 must stay
            # UNWEIGHTED or the sources would carry fw twice.
            ops, lin_prep = jax.linearize(
                prep, Z_pp_m, Z_mp_m, tau, scat_w * fw, Em1_pre,
                Em10_pre, att_pre, ek_pre, F0)
            dops = []
            for qi, q in enumerate(tan_idx):
                d = tangents[q]
                dEm1, dEm10, datt, dek, _ = d_pre[q]
                dops.append(lin_prep(
                    dZ_pp_m[qi], dZ_mp_m[qi], d.tau.astype(dtype),
                    d.scat_w.astype(dtype) * fw, dEm1, dEm10, datt, dek,
                    d.F0.astype(dtype)))

            # block 8 is the Mosaic floor (the sublane rule requires the
            # second-to-last block dim to be a multiple of 8); VMEM
            # pressure is held down instead by the 100M scoped limit and
            # the rematerialized elemental assembly (see _mt_kernel).
            comp6, dcomp = fused_moment_multitangent(
                ops, dops, geom, qp_mu_N, nz=nz, ns_sched=sched,
                ns_inter=config.ns_inter, ndoubl=config.ndoubl,
                block=min(config.band_block, 8),
                dot_mode=_mt_dot_mode(config.dot_mode))

            def tail(c6, sr, sj, ss, F0_, tboa, sif_):
                comp = CompositeLayer(*c6[:4], c6[4][..., None],
                                      c6[5][..., None])
                surf = _surface_layer(sr, sj, direct_m, ss, F0_, tboa,
                                      mu0, sif_, is_m0, config, dtype)
                if p > 1:
                    surf = AddedLayer(
                        *(pack_mat(a, p) for a in surf[:4]),
                        *(pack_vec(a, p) for a in surf[4:]))
                comp_out = interaction(comp, surf)
                J0_m = unpack_vec(comp_out.J0_m, p).sum(axis=-1)
                J0_p = unpack_vec(comp_out.J0_p, p).sum(axis=-1)
                w3 = vza_w_m[:, :, None]
                Rm = jnp.transpose(J0_m[:, vza_rows], (1, 2, 0)) * w3
                Tm = jnp.transpose(J0_p[:, vza_rows], (1, 2, 0)) * w3
                return Rm, Tm

            (Rm, Tm), lin_tail = jax.linearize(
                tail, comp6, surf_r_m, surf_j_m, surf_spec, F0, tau_boa,
                sif0)
            R = R + Rm
            T = T + Tm
            dRs, dTs = [], []
            for qi, q in enumerate(tan_idx):
                d = tangents[q]
                dc6 = tuple(a[qi] for a in dcomp)
                dRm, dTm = lin_tail(
                    dc6, dsurf_r_m[qi], dsurf_j_m[qi],
                    d.surf_spec.astype(dtype), d.F0.astype(dtype),
                    d_pre[q][4], d.sif_spec.astype(dtype))
                dRs.append(dRm)
                dTs.append(dTm)
            dR = dR + jnp.stack(dRs)
            dT = dT + jnp.stack(dTs)
            return (R, T, dR, dT), None

        z1 = jnp.zeros((nvza, ns, n_spec), dtype)
        zP = jnp.zeros((Pc, nvza, ns, n_spec), dtype)
        dZ_pp_x = jnp.stack([tangents[q].Z_pp.astype(dtype)
                             for q in tan_idx], axis=1)   # (n_m, Pc, C...)
        dZ_mp_x = jnp.stack([tangents[q].Z_mp.astype(dtype)
                             for q in tan_idx], axis=1)
        dsurf_r_x = jnp.stack([tangents[q].surf_r.astype(dtype)
                               for q in tan_idx], axis=1)
        dsurf_j_x = jnp.stack([tangents[q].surf_j_m.astype(dtype)
                               for q in tan_idx], axis=1)
        xs = (inputs.Z_pp.astype(dtype), inputs.Z_mp.astype(dtype),
              inputs.surf_r.astype(dtype), inputs.surf_j_m.astype(dtype),
              inputs.surf_direct_m.astype(dtype),
              inputs.vza_w.astype(dtype), fourier_w,
              jnp.arange(n_m) == 0,
              dZ_pp_x, dZ_mp_x, dsurf_r_x, dsurf_j_x)
        (R, T, dR, dT), _ = jax.lax.scan(moment_body, (z1, z1, zP, zP), xs)
        return R, T, dR, dT

    dRs, dTs = [], []
    R = T = None
    for c0 in range(0, P_all, mt_chunk):
        tan_idx = list(range(c0, min(c0 + mt_chunk, P_all)))
        # equal chunk sizes keep one kernel compile: pad the last chunk
        # by repeating its first index (discarded below)
        n_pad = 0
        if c0 > 0 and len(tan_idx) < mt_chunk:
            n_pad = mt_chunk - len(tan_idx)
            tan_idx = tan_idx + [tan_idx[0]] * n_pad
        R, T, dR, dT = run_chunk(tan_idx)
        keep = len(tan_idx) - n_pad
        dRs.append(dR[:keep])
        dTs.append(dT[:keep])
    return R, T, jnp.concatenate(dRs), jnp.concatenate(dTs)
