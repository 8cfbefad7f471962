"""Whole-moment fused Pallas kernel: elemental matrices + doubling ladder +
adding for ALL layers of one Fourier moment, VMEM-resident.

Round-3 profiler finding: with the per-layer fused kernel (ops/fused_rt.py)
the kernel is only ~40% of the solve — the XLA elemental assembly (big
(s, N, N) elementwise fusions), the block-diagonal packing scatters, and
the layer-scan carry copies cost more than the MXU work they feed. This
kernel moves the O(s N^2) matrix pipeline inside Pallas:

* grid = (spectral blocks, nz) with ("parallel", "arbitrary") semantics:
  the composite operators live VMEM-resident across the layer dimension
  (the canonical Pallas accumulator pattern), so per moment HBM sees
  per-layer ROW TABLES (O(s N)) in and one composite out — the (s, N, N)
  elemental operators never exist in HBM;
* the kernel is PACKED-NATIVE: all operands arrive pre-shaped in the
  block-diagonal packed layout (ops/packing.py: p consecutive points share
  one (pN, pN) operator). Mosaic layout rules (measured on this toolchain,
  scripts/probe_mosaic_casts.py) allow 2D->3D expands into tiled dims,
  leading-dim reshapes, concats and batched dots — but NOT relayouts of a
  1-D lane vector into the leading batch dim, which is exactly what
  per-point scalar broadcasts need. So every per-(layer, point) scalar is
  pre-broadcast to its rows in XLA ((nz, bp, Np) tables — free reshapes /
  tiny elementwise) and the kernel only ever does supported casts;
* O(s N) source vectors (solar/thermal j0, expk rows) are built in XLA
  (they reuse the f64-accurate expm1/exp precursors of core/kernels, so
  numerics match the unfused path bit-for-bit at f32) — only the O(s N^2)
  matrix assembly and the O(s N^3 ndoubl) ladder run in-kernel;
* the doubling ladder and interaction reuse _doubling_math /
  _interaction_math from ops/fused_rt.py — the same algebra as the XLA
  path (NS-schedule inverse, push-through identity, column-concatenated
  source dots).

Behavioral reference for the elemental formulas:
/root/reference/src/CoreRT/CoreKernel/elemental.jl:63-392 (Fell 1997 exact
finite-dtau operators); bar to beat: ext/gpu_batched_cuda.jl:133-233.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_rt import _doubling_math, _interaction_math, _norm_sched

_I0 = np.int32(0)

# geom table rows (the last four only materialize for the inelastic
# block-bichromatic kernel, ops/fused_rrs.py — see _geom_tables(ie=True))
(_RG, _A, _INVD, _SAME, _EYE, _TO, _TS, _DI, _DJ, _SGN,
 _MUI, _MUJ, _IMI, _IMJ) = range(14)


def _expm1_series(x):
    """6-term Horner expm1 series: rel err < 1e-7 for |x| < 0.3 — pure
    f32 arithmetic, no dependence on Mosaic's native exp (which is only
    ~30 ulp and, amplified 2^ndoubl by the doubling ladder, breaks parity
    with the XLA path at the 1e-3 level)."""
    return x * _expm1_ratio_series(x)


def _expm1_ratio_series(x):
    """expm1(x)/x as the same Horner chain (shared with the ie kernel's
    mixed-depth transmission ratio, which needs the /x form directly)."""
    return 1.0 + x * (0.5 + x * (1.0 / 6.0 + x * (
        1.0 / 24.0 + x * (1.0 / 120.0 + x * (1.0 / 720.0)))))


def _moment_kernel(Zpp_ref, Zmp_ref, geom_ref, zflag_ref, wrow_ref, Em1_ref,
                   dt_ref, jp_ref, jms_ref, ekr_ref,
                   Rmp_o, Rpm_o, Tpp_o, Tmm_o, Jp_o, Jm_o,
                   *, nz, ns_sched, ns_inter, dot_mode, k1=False):
    """One (spectral-block, layer) grid step; all shapes packed.

    Refs (bp = packed block, Np = pack*N, C = components, K = sources):
      Zpp/Zmp (C, Np, Np)  block-diag tiled phase supermatrices
      geom    (10, Np, Np) static geometry tables (row indices _RG.._SGN)
      zflag   (1, 8, 128)  1.0 on the first layer else 0.0
      wrow    (1, C, bp, Np)  (w_c/tau) [x fourier factor] per row
      Em1     (1, bp, Np)  expm1(-dtau/mu_row) precursor
      dt      (1, bp, Np)  dtau per row
      jp/jms  (1, bp, Np, K)  elemental sources (jms pre-starred)
      ekr     (1, bp, Np, K)  per-row doubling attenuation factors

    DIFFERENTIABILITY CONTRACT (core/linearization.py runs jax.jvp
    straight through this kernel — pallas_call's automatic JVP rule
    generates the tangent kernel): no scratch_shapes (the rule rejects
    them — the composite accumulates directly in the OUTPUT refs, whose
    index maps ignore the z grid dim so Mosaic keeps them VMEM-resident
    across layers), no pl.program_id (its jvp re-trace asserts outside a
    grid context — the first-layer flag arrives as the zflag operand),
    and every operand must carry a (possibly zero but INSTANTIATED)
    tangent (the rule drops symbolic zeros and then miscounts block
    mappings). The uninitialized first-layer read of the output refs is
    masked with jnp.where, which never propagates the unselected
    garbage."""
    dtype = Zpp_ref.dtype
    bp, Np = Em1_ref.shape[1], Em1_ref.shape[2]
    first = zflag_ref[0, 0, 0] > 0.5

    # K == 1 layout (k1): source tables and outputs travel through HBM
    # WITHOUT the trailing K axis — a trailing dim of 1 lands in the lane
    # position of the (8, 128) tile and pads the buffer 128x (measured:
    # a (nz, bp, Np, 1) table of 387 MB allocated 49.5 GB). The K axis is
    # re-expanded here (2D->3D expands into tiled dims are supported
    # Mosaic casts — scripts/probe_mosaic_casts.py).
    def _kx(x):
        return x[..., None] if k1 else x
    jp_in = _kx(jp_ref[0])
    jms_in = _kx(jms_ref[0])
    ekr_in = _kx(ekr_ref[0])

    eye = geom_ref[_EYE][None]
    zero_m = jnp.zeros((bp, Np, Np), dtype)
    zero_v = jnp.zeros(jp_in.shape, dtype)
    Rmp_c = jnp.where(first, zero_m, Rmp_o[:])
    Rpm_c = jnp.where(first, zero_m, Rpm_o[:])
    Tpp_c = jnp.where(first, eye + zero_m, Tpp_o[:])
    Tmm_c = jnp.where(first, eye + zero_m, Tmm_o[:])
    Jp_c = jnp.where(first, zero_v, _kx(Jp_o[:]))
    Jm_c = jnp.where(first, zero_v, _kx(Jm_o[:]))

    out = _moment_body(Zpp_ref[:], Zmp_ref[:], wrow_ref[0], Em1_ref[0],
                       dt_ref[0], jp_in, jms_in, ekr_in,
                       Rmp_c, Rpm_c, Tpp_c, Tmm_c, Jp_c, Jm_c,
                       geom=geom_ref[:], ns_sched=ns_sched,
                       ns_inter=ns_inter, dot_mode=dot_mode)
    if k1:
        out = out[:4] + (out[4][..., 0], out[5][..., 0])
    for ref, val in zip((Rmp_o, Rpm_o, Tpp_o, Tmm_o, Jp_o, Jm_o), out):
        ref[:] = val


def _moment_body(Zpp, Zmp, wrow, Em1, dt, jp, jms, ekr,
                 Rmp_c, Rpm_c, Tpp_c, Tmm_c, Jp_c, Jm_c,
                 *, geom, ns_sched, ns_inter, dot_mode,
                 remat_assembly=False):
    """Pure per-(block, layer) step on ARRAYS (no refs): elemental
    assembly + doubling ladder + adding. Shared by the elastic kernel and
    the multitangent kernel (ops/fused_lin.py), whose jax.linearize
    replays P tangents against ONE primal trace of this function — the
    linearize-split the reference hand-writes as its ap_* all-parameter
    kernels (elemental_lin.jl:456-602, doubling_lin.jl:79-475).

    remat_assembly: rematerialize the elemental assembly in tangent
    replays (jax.checkpoint) — its ~30 (bb, Np, Np) intermediates would
    otherwise all be linearize residuals pinned in VMEM across every
    tangent chain; recomputing them is cheap VPU work."""
    # ---- elemental assembly (core/kernels.elemental algebra, in VMEM) ----
    if remat_assembly:
        import jax as _jax

        def _asm(Zpp_, Zmp_, wrow_, Em1_, dt_):
            r, t, _ = _assemble_elemental(Zpp_, Zmp_, geom, wrow_, Em1_,
                                          dt_)
            return r, t
        r_mp, t_pp = _jax.checkpoint(_asm)(Zpp, Zmp, wrow, Em1, dt)
    else:
        r_mp, t_pp, _ = _assemble_elemental(Zpp, Zmp, geom, wrow, Em1, dt)

    r_star = r_mp * geom[_DI][None]

    # ---- doubling ladder + adding (shared algebra with the XLA path) ----
    # dot_mode "A/B" = ladder mode A, interaction mode B (probe syntax).
    m_lad, _, m_int = dot_mode.partition("/")
    m_int = m_int or ("split3" if m_lad == "split3d" else m_lad)
    r, t, jp_v, jm_v = _doubling_math(
        r_star, t_pp, jp, jms, ekr, ns_sched, m_lad,
        beer_diag=1.0 + Em1)
    d_col = geom[_DI][:, :1][None]           # (1, Np, 1): d_i per row
    r_mp_l = r * geom[_DI][None]             # unstar: multiply rows by d_i
    jm_u = jm_v * d_col
    r_pm_l = geom[_SGN][None] * r_mp_l
    t_mm_l = geom[_SGN][None] * t

    return _interaction_math(
        Rmp_c, Rpm_c, Tpp_c, Tmm_c, Jp_c, Jm_c,
        r_mp_l, r_pm_l, t, t_mm_l, jp_v, jm_u, ns_inter, m_int)


def _assemble_elemental(Zpp_ref, Zmp_ref, geom_ref, wrow, Em1, dt):
    """In-VMEM elemental operator assembly shared by the elastic band
    kernel and the block-bichromatic ie kernel (ops/fused_rrs.py).

    wrow (C, bp, Np), Em1/dt (bp, Np). Returns (r_mp, t_pp, one_m_EE);
    one_m_EE is returned because the ie (2,1)-block elemental reuses it
    (on concatenated [lambda0; lambda1] row tables it evaluates to exactly
    1 - E1_i E0_j in that block)."""
    E_j = 1.0 + Em1[:, None, :]
    E_i = 1.0 + Em1[:, :, None]

    # wZ = [sum_c (w_c/tau) Z_c]  with per-point scalars as row products —
    # valid on block-diagonal operators (off-blocks are zero in Zbd).
    wZ_pp = Zpp_ref[0][None] * wrow[0][:, :, None]
    wZ_mp = Zmp_ref[0][None] * wrow[0][:, :, None]
    for c in range(1, wrow.shape[0]):
        wZ_pp = wZ_pp + Zpp_ref[c][None] * wrow[c][:, :, None]
        wZ_mp = wZ_mp + Zmp_ref[c][None] * wrow[c][:, :, None]

    one_m_EE = -(Em1[:, :, None] + Em1[:, None, :]
                 + Em1[:, :, None] * Em1[:, None, :])
    r_mp = wZ_mp * geom_ref[_RG][None] * one_m_EE

    # t_off ratio expm1(u_i - u_j)/delta with u = -dtau/mu, built WITHOUT
    # Mosaic's native exp: the identity expm1(u_i - u_j) =
    # (Em1_i - Em1_j)/E_j reuses the f64-accurate precursors; the pure-f32
    # series covers the small-|x| region where that difference cancels.
    # Note E_j cancels against the t_off E_j factor in the identity branch.
    # The off-diagonal/same-mu masks and the 1/delta factor are FOLDED
    # into the static _TO/_TS tables (round-5 VPU shave): _TO already
    # carries (1-same) mu_j w_j / delta and _TS carries same * w_j / mu_i,
    # so the branch select + mask arithmetic collapses to one where.
    x = dt[:, :, None] * geom_ref[_A][None]        # = u_i - u_j
    num = jnp.where(jnp.abs(x) < 0.3, _expm1_series(x) * E_j,
                    Em1[:, :, None] - Em1[:, None, :])
    t_pp = wZ_pp * (num * geom_ref[_TO][None]
                    + (dt[:, :, None] * geom_ref[_TS][None]) * E_j) \
        + E_i * geom_ref[_EYE][None]
    return r_mp, t_pp, one_m_EE


def _geom_tables(qp_mu_N, wct, d_vec, pack, dtype, ie=False):
    """Static (10, Np, Np) geometry stack in the packed layout.

    Cross-block entries are garbage-safe: every term they feed is masked by
    the block-diagonal Z (zero off-block) or the identity."""
    qp = jnp.tile(qp_mu_N, pack)
    wt = jnp.tile(wct, pack)
    d = jnp.tile(d_vec, pack)
    mu_i = qp[:, None]
    mu_j = qp[None, :]
    same = (jnp.abs(mu_i - mu_j) <= 1e-9 * jnp.maximum(mu_i, mu_j))
    delta = jnp.where(same, 1.0, mu_i - mu_j)
    Np = qp.shape[0]
    eye = jnp.eye(Np, dtype=dtype)
    nsame = 1.0 - same.astype(dtype)
    tabs = [
        (mu_j / (mu_i + mu_j)) * wt[None, :],      # _RG
        delta / (mu_i * mu_j),                     # _A
        1.0 / delta,                               # _INVD
        same.astype(dtype),                        # _SAME
        eye,                                       # _EYE
        nsame * mu_j * wt[None, :] / delta,        # _TO (t_off geometry,
                                                   #  masks + 1/delta folded)
        same.astype(dtype) * wt[None, :] / mu_i,   # _TS (t_same geometry,
                                                   #  same-mu mask folded)
        jnp.broadcast_to(d[:, None], (Np, Np)),    # _DI
        jnp.broadcast_to(d[None, :], (Np, Np)),    # _DJ
        d[:, None] * d[None, :],                   # _SGN
    ]
    if ie:
        # Extra rows for the ie (2,1)-block elemental (ops/fused_rrs.py):
        # the mixed-depth geometry factors need raw mu_i/mu_j and their
        # reciprocals per entry (the elastic factors fold them away).
        tabs += [
            jnp.broadcast_to(mu_i, (Np, Np)),      # _MUI
            jnp.broadcast_to(mu_j, (Np, Np)),      # _MUJ
            jnp.broadcast_to(1.0 / mu_i, (Np, Np)),   # _IMI
            jnp.broadcast_to(1.0 / mu_j, (Np, Np)),   # _IMJ
        ]
    return jnp.stack([t.astype(dtype) for t in tabs])


def solar_source_vectors(Z_pp_m, Z_mp_m, w_over, F0_m, Em1, Em1_0, att,
                         dtau, qp_mu_N, in_blk, i_mu0_start, n_stokes,
                         dtype):
    """(nz, s, N) solar SFI elemental source vectors, XLA-side
    (kernels.elemental algebra on the f64-accurate precursors): Z columns
    at the solar block dotted with F0, attenuation folded in. Shared by
    fused_moment and the ie kernel prep (which rolls these pointwise
    vectors to the Raman source wavelength — roll commutes with every
    per-point product here)."""
    ns = n_stokes
    nz, _, s = w_over.shape
    sl0 = i_mu0_start
    Zp_blk = Z_pp_m[:, :, sl0:sl0 + ns]                     # (C, N, ns)
    Zm_blk = Z_mp_m[:, :, sl0:sl0 + ns]
    # precision="highest": TPU einsum defaults to bf16 multiply passes
    # (measured 2.7e-3 rel err, scripts/probe_mosaic_dot_prec.py) — enough
    # to fail the 1e-4 fused-vs-plain parity gate through the sources.
    Zp_I0 = jnp.einsum("zcs,ks,cnk->zsn", w_over, F0_m, Zp_blk,
                       precision="highest")
    Zm_I0 = jnp.einsum("zcs,ks,cnk->zsn", w_over, F0_m, Zm_blk,
                       precision="highest")

    from ..core.kernels import _expm1
    mu0 = qp_mu_N[sl0]
    E = 1.0 + Em1                                           # (nz, s, N)
    E_0 = (1.0 + Em1_0)[:, :, None]
    dt3 = dtau[:, :, None]
    jp_in = Zp_I0 * (dt3 / qp_mu_N[None, None, :]) * E
    delta_s = jnp.where(in_blk > 0.5, 1.0, qp_mu_N - mu0)[None, None, :]
    jp_out = Zp_I0 * (mu0 / delta_s) * E_0 * \
        _expm1(dt3 * delta_s / (qp_mu_N[None, None, :] * mu0)).astype(dtype)
    j_sol_p = jnp.where(in_blk[None, None, :] > 0.5, jp_in, jp_out)
    one_m_EE0 = -(Em1 + Em1_0[:, :, None] + Em1 * Em1_0[:, :, None])
    j_sol_m = Zm_I0 * (mu0 / (qp_mu_N[None, None, :] + mu0)) * one_m_EE0
    att3 = att[:, :, None]
    return j_sol_p * att3, j_sol_m * att3


def band_operands(Z_pp_m, Z_mp_m, tau, scat_w, Em1, Em1_0, att, ek_sol,
                  thermal, F0_m, qp_mu_N, d_vec, is_I, in_blk,
                  *, ndoubl, pack, n_stokes, i_mu0_start, n_sources):
    """XLA-side prep of the band kernel's operand arrays — a PURE function
    of the differentiable inputs, so ops/fused_lin.py can jax.linearize
    it once and replay per-parameter tangents cheaply. Returns
    (Zbd_pp, Zbd_mp, wrow, Em1p, dtp, j0_p, jm_star, ekr) with the K axis
    squeezed when n_sources == 1 (the k1 HBM layout)."""
    nz, s = tau.shape
    C, N, _ = Z_pp_m.shape
    K = n_sources
    ns = n_stokes
    bp_tot = s // pack
    Np = pack * N
    dtype = Z_pp_m.dtype

    safe_tau = jnp.where(tau > 0, tau, 1.0)
    w_over = scat_w / safe_tau[:, None, :]                  # (nz, C, s)
    wrow = jnp.broadcast_to(w_over[..., None], (nz, C, s, N)) \
        .reshape(nz, C, bp_tot, Np)
    Em1p = Em1.reshape(nz, bp_tot, Np)
    dtau = tau / (2.0 ** ndoubl)
    dtp = jnp.broadcast_to(dtau[:, :, None], (nz, s, N)) \
        .reshape(nz, bp_tot, Np)

    j_sol_p, j_sol_m = solar_source_vectors(
        Z_pp_m, Z_mp_m, w_over, F0_m, Em1, Em1_0, att, dtau, qp_mu_N,
        in_blk, i_mu0_start, ns, dtype)

    ek3 = jnp.broadcast_to(ek_sol[:, :, None], (nz, s, N))
    if K == 1:
        j0_p = j_sol_p[..., None]
        j0_m = j_sol_m[..., None]
        ekr = ek3[..., None]
    else:
        j_th = thermal[:, :, None] * (-Em1) * is_I[None, None, :]
        j0_p = jnp.stack([j_sol_p, j_th], axis=-1)
        j0_m = jnp.stack([j_sol_m, j_th], axis=-1)
        ekr = jnp.stack([ek3, jnp.ones_like(ek3)], axis=-1)
    jm_star = j0_m * d_vec[None, None, :, None]
    j0_p = j0_p.reshape(nz, bp_tot, Np, K).astype(dtype)
    jm_star = jm_star.reshape(nz, bp_tot, Np, K).astype(dtype)
    ekr = ekr.reshape(nz, bp_tot, Np, K).astype(dtype)
    # K == 1: drop the trailing source axis from the HBM layout (it would
    # otherwise occupy the 128-lane tile position — 128x buffer padding;
    # see _moment_kernel's k1 note). Re-expanded in-kernel and on return.
    if K == 1:
        j0_p, jm_star, ekr = j0_p[..., 0], jm_star[..., 0], ekr[..., 0]

    Zbd_pp = jnp.stack([jnp.kron(jnp.eye(pack, dtype=dtype), Z_pp_m[c])
                        for c in range(C)])
    Zbd_mp = jnp.stack([jnp.kron(jnp.eye(pack, dtype=dtype), Z_mp_m[c])
                        for c in range(C)])
    return (Zbd_pp, Zbd_mp, wrow.astype(dtype), Em1p.astype(dtype),
            dtp.astype(dtype), j0_p, jm_star, ekr)


def fused_moment(Z_pp_m, Z_mp_m, tau, scat_w, Em1, Em1_0, att, ek_sol,
                 thermal, F0_m, qp_mu_N, wct, d_vec, is_I, in_blk,
                 *, ndoubl, ns_sched=None, ns_inter=6, pack=1,
                 n_stokes, i_mu0_start, n_sources=1, block=16,
                 interpret=None, dot_mode="highest"):
    """Run all nz layers of one Fourier moment in one Pallas kernel.

    Shapes: Z (C, N, N); tau/Em1_0/att/ek_sol/thermal (nz, s);
    scat_w (nz, C, s); Em1 (nz, s, N); F0_m (ns, s); vectors (N,).
    wct = fourier_weight * wt_mu_N and F0_m = fourier_weight * F0 (the
    per-moment scalars are folded into the inputs so one compilation
    serves every moment). Returns the packed composite tuple
    (R_mp, R_pm, T_pp, T_mm, J0_p, J0_m): (s/pack, pN, pN) / (s/pack, pN, K).
    """
    nz, s = tau.shape
    C, N, _ = Z_pp_m.shape
    K = n_sources
    assert s % pack == 0, (s, pack)
    bp_tot = s // pack
    Np = pack * N
    dtype = Z_pp_m.dtype
    ns_sched = _norm_sched(ns_sched, ndoubl)
    if dtype != jnp.float32 and "split" in dot_mode:
        dot_mode = "highest"    # bf16 splitting is an f32 construction
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    (Zbd_pp, Zbd_mp, wrow, Em1p, dtp, j0_p, jm_star, ekr) = band_operands(
        Z_pp_m, Z_mp_m, tau, scat_w, Em1, Em1_0, att, ek_sol, thermal,
        F0_m, qp_mu_N, d_vec, is_I, in_blk, ndoubl=ndoubl, pack=pack,
        n_stokes=n_stokes, i_mu0_start=i_mu0_start, n_sources=n_sources)
    k1 = K == 1
    geom = _geom_tables(qp_mu_N.astype(dtype), wct.astype(dtype),
                        d_vec.astype(dtype), pack, dtype)

    # Spectral blocking: bb packed points per program. Keep bb SMALL:
    # Mosaic unrolls the batch dim of every dot, so compile time and VMEM
    # scale ~linearly with bb. Measured r4 (n_spec=1024, flagship): block
    # 8 -> 2322 pts/s, 16 -> 2416, 32 -> 2450 but ~8 min compile — 16 is
    # the adopted balance.
    # Mosaic requires the block's second-to-last dim to be a multiple of 8
    # or equal to the array dim, so awkward widths (e.g. nSpec=60 -> bp=30,
    # the reference's own Tutorial_GPU operating point) are PADDED up to a
    # multiple of the block with benign vacuum points (Em1=0 -> t=I, all
    # sources zero) and the outputs sliced back.
    bb = bp_tot if bp_tot <= block else block
    bp_pad = bp_tot
    if bp_tot > block and bp_tot % bb:
        bp_pad = ((bp_tot + bb - 1) // bb) * bb
        padn = bp_pad - bp_tot

        def padp(x, axis, value=0.0):
            widths = [(0, 0)] * x.ndim
            widths[axis] = (0, padn)
            return jnp.pad(x, widths, constant_values=value)
        wrow = padp(wrow, 2)
        Em1p = padp(Em1p, 1)
        dtp = padp(dtp, 1)
        j0_p = padp(j0_p, 1)
        jm_star = padp(jm_star, 1)
        ekr = padp(ekr, 1, value=1.0)
    grid = (bp_pad // bb, nz)

    def vmem(shape):
        return pl.BlockSpec(shape, lambda i, z: (_I0,) * len(shape),
                            memory_space=pltpu.VMEM)

    # First-layer flag operand (see _moment_kernel differentiability
    # contract). Derived from tau so it carries an instantiated tangent
    # under jvp; the 0*tau term folds away outside AD.
    zflag = (jnp.zeros((nz, 8, 128), dtype).at[0].set(1.0)
             + 0.0 * tau[0, 0].astype(dtype))

    if k1:
        vspec = pl.BlockSpec((1, bb, Np), lambda i, z: (z, i, _I0),
                             memory_space=pltpu.VMEM)
        vec_o = pl.BlockSpec((bb, Np), lambda i, z: (i, _I0),
                             memory_space=pltpu.VMEM)
        vec_shape = jax.ShapeDtypeStruct((bp_pad, Np), dtype)
    else:
        vspec = pl.BlockSpec((1, bb, Np, K), lambda i, z: (z, i, _I0, _I0),
                             memory_space=pltpu.VMEM)
        vec_o = pl.BlockSpec((bb, Np, K), lambda i, z: (i, _I0, _I0),
                             memory_space=pltpu.VMEM)
        vec_shape = jax.ShapeDtypeStruct((bp_pad, Np, K), dtype)
    in_specs = [
        vmem((C, Np, Np)),                                       # Zbd_pp
        vmem((C, Np, Np)),                                       # Zbd_mp
        vmem((10, Np, Np)),                                      # geom
        pl.BlockSpec((1, 8, 128), lambda i, z: (z, _I0, _I0),
                     memory_space=pltpu.VMEM),                   # zflag
        pl.BlockSpec((1, C, bb, Np), lambda i, z: (z, _I0, i, _I0),
                     memory_space=pltpu.VMEM),                   # wrow
        pl.BlockSpec((1, bb, Np), lambda i, z: (z, i, _I0),
                     memory_space=pltpu.VMEM),                   # Em1
        pl.BlockSpec((1, bb, Np), lambda i, z: (z, i, _I0),
                     memory_space=pltpu.VMEM),                   # dt
        vspec,                                                   # jp
        vspec,                                                   # jm_star
        vspec,                                                   # ekr
    ]
    mat_o = pl.BlockSpec((bb, Np, Np), lambda i, z: (i, _I0, _I0),
                         memory_space=pltpu.VMEM)
    out_shapes = (jax.ShapeDtypeStruct((bp_pad, Np, Np), dtype),) * 4 + \
                 (vec_shape,) * 2

    kernel = partial(_moment_kernel, nz=nz, ns_sched=ns_sched,
                     ns_inter=ns_inter, dot_mode=dot_mode, k1=k1)
    fn = pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs,
        out_specs=(mat_o,) * 4 + (vec_o,) * 2,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    out = fn(Zbd_pp, Zbd_mp, geom, zflag, wrow.astype(dtype),
             Em1p.astype(dtype), dtp.astype(dtype), j0_p, jm_star, ekr)
    if bp_pad != bp_tot:
        out = tuple(o[:bp_tot] for o in out)
    if k1:
        out = out[:4] + (out[4][..., None], out[5][..., None])
    return out
