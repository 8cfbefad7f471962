"""Block-bichromatic Pallas band kernel for rotational-Raman (RRS) transport.

Round-4 finding (PERF.md): the RRS+SIF BASELINE config is bounded by
XLA:TPU's batched small-matmul rate — (nR*s, N, N) dots sustain 0.9-1.5
TF/s while Mosaic runs the same shape classes 6-20x faster. This module
moves the ENTIRE inelastic ladder into the band kernel with a structural
trick rather than a hand-derived product-rule kernel:

For one Raman shift, the coupled two-wavelength transport operator is
block-lower-triangular,

    X_blk = [[X(l0),  0   ],
             [ieX,    X(l1)]],      l0 = source, l1 = target wavelength,

and every operation in the adding-doubling algebra — products, the
Newton-Schulz geometric inverse (whose iterates are truncated Neumann
polynomials in X_blk), the push-through interaction identity — preserves
that structure, and the (2,1) block of any product/inverse is EXACTLY the
first-order bichromatic product rule that the reference hand-writes per
kernel (/root/reference/src/CoreRT/CoreKernel/doubling_inelastic.jl:74-143,
interaction_inelastic.jl:62-360) and that core/inelastic.py implements in
XLA. So each (shift, spectral point) pair becomes one pack=2
block-diagonal problem for the EXISTING band-kernel machinery
(ops/fused_band.py) on (2N, 2N) operators:

* the diagonal blocks are the elastic elementals at l0 (rolled row
  tables, zero-padded off-grid) and l1 — the standard packed assembly
  builds them untouched from concatenated [l0; l1] row tables;
* the only new in-kernel code is the ie (2,1)-block elemental
  (mixed-optical-depth single-scatter operators,
  elemental_inelastic.jl:117-206);
* the block source vector is [j_sol(l0); iej] with per-ROW beam
  attenuation ek(l0) on BOTH halves — the ie source attenuates with the
  SOURCE-wavelength beam factor, and the l1 elastic source never appears
  in any ie update (verified term-by-term against
  core/inelastic.ie_doubling_step) — so the second half of the composite
  source output IS the ie source with no cancellation.

MXU accounting: the block form executes ~4x the flops of the hand-rolled
per-shift algebra (it recomputes both elastic wavelengths per shift and
multiplies structural zeros), but at (2N/128)^2 / (N/128)^2 = 4x the MXU
tile utilization — the same wall-clock per pass, a fraction of the code,
and the whole ladder + per-layer adding runs VMEM-resident at Mosaic
rates instead of XLA's batched-small-matmul rate.

Out-of-band source points (i + shift off the grid) enter with zero-padded
rolled tables: d0 = 0 makes the l0 block an identity transport, and the
pref row (which carries the rolled Rayleigh scattering fraction) zeroes
the ie block — the pair contributes nothing, and the l1 elastic block is
untouched (block-triangular products never feed l0 values into it).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_band import (_DI, _EYE, _IMI, _IMJ, _MUI, _MUJ, _SGN,
                         _assemble_elemental, _expm1_ratio_series,
                         _geom_tables, solar_source_vectors)
from .fused_rt import _doubling_math, _interaction_math, _norm_sched

_I0 = np.int32(0)


def _rrs_kernel(Zpp_ref, Zmp_ref, Zrw_pp_ref, Zrw_mp_ref, geom_ref,
                zflag_ref, wrow_ref, pref_ref, Em1_ref, dt_ref,
                jp_ref, jms_ref, ekr_ref,
                Rmp_o, Rpm_o, Tpp_o, Tmm_o, Jp_o, Jm_o,
                *, nz, ns_sched, ns_inter, dot_mode):
    """One (pair-block, layer) grid step on (2N, 2N) block operators.

    Extra refs vs the elastic _moment_kernel: Zrw_pp/Zrw_mp (1, Np, Np)
    Raman phase supermatrices pre-masked to the (2,1) block and
    pre-scaled by the column weights wct_j; pref (1, bb, Np) per-pair
    scalar rows w_shift * fScattRayleigh(l0) (zero off-grid)."""
    dtype = Zpp_ref.dtype
    bp, Np = Em1_ref.shape[1], Em1_ref.shape[2]
    first = zflag_ref[0, 0, 0] > 0.5

    # K = 1 source layout: the trailing source axis is dropped from HBM
    # (it would pad the 128-lane tile position 128x — see fused_band's
    # _moment_kernel k1 note) and re-expanded here.
    jp_in = jp_ref[0][..., None]
    jms_in = jms_ref[0][..., None]
    ekr_in = ekr_ref[0][..., None]

    eye = geom_ref[_EYE][None]
    zero_m = jnp.zeros((bp, Np, Np), dtype)
    zero_v = jnp.zeros(jp_in.shape, dtype)
    Rmp_c = jnp.where(first, zero_m, Rmp_o[:])
    Rpm_c = jnp.where(first, zero_m, Rpm_o[:])
    Tpp_c = jnp.where(first, eye + zero_m, Tpp_o[:])
    Tmm_c = jnp.where(first, eye + zero_m, Tmm_o[:])
    Jp_c = jnp.where(first, zero_v, Jp_o[:][..., None])
    Jm_c = jnp.where(first, zero_v, Jm_o[:][..., None])

    # Elastic diagonal blocks: the standard assembly on concatenated
    # [l0; l1] row tables with block-diagonal Z builds both wavelengths'
    # elementals in place (cross-block entries are killed by the Z mask
    # exactly as in the ordinary packed layout).
    Em1 = Em1_ref[0]                         # (bb, Np)
    dt = dt_ref[0]
    r_mp, t_pp, one_m_EE = _assemble_elemental(
        Zpp_ref, Zmp_ref, geom_ref, wrow_ref[0], Em1, dt)

    # ---- ie (2,1)-block elemental (get_elem_rt_RRS!,
    # elemental_inelastic.jl:117-206; the same unified mixed-depth kernels
    # as core/inelastic.ie_elemental). Inside the (2,1) block (rows = l1,
    # cols = l0) the concatenated tables give dt_i = d1, dt_j = d0,
    # Em1_i = Em1_l1, Em1_j = Em1_l0 — so one_m_EE is already the ie
    # reflection factor 1 - E1_i E0_j there. ----
    dt_i = dt[:, :, None]
    dt_j = dt[:, None, :]
    pref = pref_ref[0][:, :, None]           # per-pair scalar (any row)
    # r_ie geometry: 1/(mu_i/mu_j + d1/d0) = mu_j d0 / (mu_i d0 + mu_j d1)
    denom = geom_ref[_MUI][None] * dt_j + geom_ref[_MUJ][None] * dt_i
    fac_r = (geom_ref[_MUJ][None] * dt_j) / jnp.where(denom > 0, denom, 1.0)
    r_mp = r_mp + Zrw_mp_ref[0][None] * (pref * fac_r * one_m_EE)
    # t_ie: (d0/mu_i) E0_j expm1(x)/x with x = d0/mu_j - d1/mu_i = u_i-u_j;
    # identity branch E0_j expm1(x) = Em1_i - Em1_j on concatenated tables
    # (the same cancellation-free construction as the elastic t_off).
    x = dt_j * geom_ref[_IMJ][None] - dt_i * geom_ref[_IMI][None]
    small = jnp.abs(x) < 0.3
    E_j = 1.0 + Em1[:, None, :]
    ratio = jnp.where(small, E_j * _expm1_ratio_series(x),
                      (Em1[:, :, None] - Em1[:, None, :])
                      / jnp.where(small, 1.0, x))
    t_pp = t_pp + Zrw_pp_ref[0][None] * \
        (pref * (dt_j * geom_ref[_IMI][None]) * ratio)

    # ---- identical ladder + adding as the elastic band kernel ----
    r_star = r_mp * geom_ref[_DI][None]
    m_lad, _, m_int = dot_mode.partition("/")
    m_int = m_int or ("split3" if m_lad == "split3d" else m_lad)
    r, t, jp_v, jm_v = _doubling_math(
        r_star, t_pp, jp_in, jms_in, ekr_in, ns_sched, m_lad,
        beer_diag=1.0 + Em1)
    d_col = geom_ref[_DI][:, :1][None]       # (1, Np, 1): d_i per row
    r_mp_l = r * geom_ref[_DI][None]
    jm_u = jm_v * d_col
    r_pm_l = geom_ref[_SGN][None] * r_mp_l
    t_mm_l = geom_ref[_SGN][None] * t

    out = _interaction_math(
        Rmp_c, Rpm_c, Tpp_c, Tmm_c, Jp_c, Jm_c,
        r_mp_l, r_pm_l, t, t_mm_l, jp_v, jm_u, ns_inter, m_int)
    out = out[:4] + (out[4][..., 0], out[5][..., 0])
    for ref, val in zip((Rmp_o, Rpm_o, Tpp_o, Tmm_o, Jp_o, Jm_o), out):
        ref[:] = val


def _roll_stack(arrays, shifts, axis):
    """Per-shift source-wavelength views: shift ``axis`` by +shift with
    zero padding (STATIC compile-time slices of one padded copy — the
    traced-shift gather form measured at 40% of the XLA RRS solve,
    PERF.md r4), stacked on a new leading nR axis."""
    M = max(max(abs(int(sh)) for sh in shifts), 1)
    outs = []
    for a in arrays:
        S = a.shape[axis]
        widths = [(0, 0)] * a.ndim
        widths[axis] = (M, M)
        ap = jnp.pad(a, widths)
        outs.append(jnp.stack([
            jax.lax.dynamic_slice_in_dim(ap, M + int(sh), S, axis=axis)
            for sh in shifts]))
    return tuple(outs)


def ie_ladder_resolution(ndoubl, ns_sched, ns_inter=6):
    """ie-specific (ndoubl, ns_sched, ns_inter): the ie field is a ~1%
    additive correction gated at ~5e-3 of its own scale (PERF.md), i.e.
    its resolution/convergence requirements are ~100x looser than the
    elastic field's. Three levers, all parity-gated against the
    full-resolution XLA path (tests/test_fused_rrs.py + the bench gate):

    * two doublings fewer (4x coarser elemental slab; O(dtau^2) elemental
      error still ~1e-4 of the ie field) — 40% of the ladder back;
    * the NS schedule keeps the LAST entries of the elastic scene-probed
      schedule (step k of the short ladder has the spectral radius of
      elastic step k + dropped) MINUS one iteration each (error goes from
      ~tol to ~sqrt(tol) = 1e-4 at the probe's 1e-8 target);
    * one interaction NS iteration fewer (same sqrt(tol) argument).
    """
    ie_nd = max(ndoubl - 2, min(ndoubl, 2))
    sched = _norm_sched(ns_sched, ndoubl)
    sched_ie = tuple(max(k - 1, 0) for k in sched[ndoubl - ie_nd:])
    return ie_nd, sched_ie, max(ns_inter - 1, 1)


def fused_moment_rrs(Z_pp_m, Z_mp_m, Zr_pp_m, Zr_mp_m, tau, scat_w,
                     Em1, Em1_0, att, ek_sol, fscatt, shifts, w_shifts,
                     F0_m, qp_mu_N, wct, d_vec, in_blk,
                     *, ndoubl, ns_sched=None, ns_inter=6,
                     n_stokes, i_mu0_start, block=16, interpret=None,
                     dot_mode="highest"):
    """All nz layers of one Fourier moment for EVERY (Raman shift,
    spectral point) pair in one Pallas kernel.

    Args mirror fused_moment (F0_m and wct carry the fourier weight; Em1 /
    Em1_0 / att / ek_sol are the l1 f64-accurate precursors) plus:
    Zr_pp_m/Zr_mp_m (N, N) Raman phase supermatrices for this moment,
    fscatt (nz, s) Rayleigh fraction of layer scattering, shifts a STATIC
    tuple of nR index offsets (n0 = n1 + shift), w_shifts (nR,) normalized
    Raman weights.

    Returns the PRE-SURFACE ie composite tuple
    (ieR_mp, ieR_pm, ieT_pp, ieT_mm, ieJp, ieJm) with shapes
    (nR, s, N, N) / (nR, s, N) — the IEComposite layout of
    core/inelastic.py, ready for the XLA surface ie_interaction.
    """
    nz, s = tau.shape
    C, N, _ = Z_pp_m.shape
    nR = len(shifts)
    dtype = Z_pp_m.dtype
    ns = n_stokes
    Np = 2 * N
    ns_sched = _norm_sched(ns_sched, ndoubl)
    if dtype != jnp.float32 and "split" in dot_mode:
        dot_mode = "highest"    # bf16 splitting is an f32 construction
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # ---- XLA prep: l1 tables + rolled l0 views -------------------------
    safe_tau = jnp.where(tau > 0, tau, 1.0)
    w_over = scat_w / safe_tau[:, None, :]                  # (nz, C, s)
    dtau = tau / (2.0 ** ndoubl)
    j_sol_p, j_sol_m = solar_source_vectors(
        Z_pp_m, Z_mp_m, w_over, F0_m, Em1, Em1_0, att, dtau, qp_mu_N,
        in_blk, i_mu0_start, ns, dtype)

    (w_over0,) = _roll_stack((w_over,), shifts, axis=2)
    (Em10, jp0, jm0) = _roll_stack((Em1, j_sol_p, j_sol_m), shifts, axis=1)
    (dt0, ek0, fsc0, Em1_00, att0) = _roll_stack(
        (dtau, ek_sol, fscatt, Em1_0, att), shifts, axis=1)
    (F0_0,) = _roll_stack((F0_m,), shifts, axis=1)          # (nR, ns, s)

    # ---- ie elemental SFI sources (ie_elemental's source algebra,
    # vectorized over (shift, layer); prefv = w_shift * fScatt(l0),
    # zero where the source point is off-grid via the rolled pad) ----
    mu0 = qp_mu_N[i_mu0_start]
    sl = slice(i_mu0_start, i_mu0_start + ns)
    Zp_I0 = jnp.einsum("ik,rks->rsi", Zr_pp_m[:, sl], F0_0,
                       precision="highest")                 # (nR, s, N)
    Zm_I0 = jnp.einsum("ik,rks->rsi", Zr_mp_m[:, sl], F0_0,
                       precision="highest")
    prefv = w_shifts[:, None, None] * fsc0                  # (nR, nz, s)
    mu_v = qp_mu_N[None, None, None, :]
    d1v = dtau[None, :, :, None]
    d0v = dt0[..., None]
    in_b = in_blk[None, None, None, :] > 0.5
    mu_s = jnp.where(in_b, mu_v, mu0)
    E_0s = jnp.where(in_b, 1.0 + Em10, (1.0 + Em1_00)[..., None])
    y = d0v / mu_s - d1v / mu_v
    y_safe = jnp.where(y == 0.0, 1.0, y)
    yr = jnp.where(y == 0.0, 1.0, jnp.expm1(y) / y_safe)
    iejp = prefv[..., None] * Zp_I0[:, None] * (d0v / mu_v) * E_0s * yr
    safe_d0 = jnp.where(dt0 > 0, dt0, 1.0)[..., None]
    one_m_EE0 = -(Em1[None] + Em1_00[..., None]
                  + Em1[None] * Em1_00[..., None])
    iejm = prefv[..., None] * Zm_I0[:, None] \
        * (1.0 / (mu_v / mu0 + d1v / safe_d0)) * one_m_EE0
    att0e = att0[..., None]
    iejp = iejp * att0e
    iejm = iejm * att0e

    # ---- pair tables: concatenate [l0; l1] along the stream axis and
    # flatten (shift, point) into the kernel's batch axis ----
    def pair(a0, a1):
        if a1.ndim < a0.ndim:          # l1 arrays without the shift axis
            a1 = jnp.broadcast_to(a1[None], (nR,) + a1.shape)
        cat = jnp.concatenate([a0, a1], axis=-1)           # (nR, nz, s, 2N)
        return jnp.moveaxis(cat, 0, 1).reshape(nz, nR * s, Np)

    def rows(a):
        return jnp.broadcast_to(a[..., None], a.shape + (N,))

    Em1p = pair(Em10, Em1).astype(dtype)
    dtp = pair(rows(dt0), rows(dtau)).astype(dtype)
    w0r = jnp.broadcast_to(w_over0[..., None],
                           (nR, nz, C, s, N))
    w1r = jnp.broadcast_to(w_over[None, ..., None], (nR, nz, C, s, N))
    wrow = jnp.moveaxis(jnp.concatenate([w0r, w1r], axis=-1), 0, 2) \
        .reshape(nz, C, nR * s, Np).astype(dtype)
    # pref is read per ROW in-kernel; the (2,1) block's rows live in the
    # l1 half, so the value must be present there — both halves carry it
    # (the Zrw mask kills it everywhere outside the ie block).
    prefp = pair(rows(prefv), rows(prefv)).astype(dtype)
    jp_pair = pair(jp0, iejp).astype(dtype)
    d2 = jnp.tile(d_vec, 2).astype(dtype)
    jm_pair = (pair(jm0, iejm) * d2[None, None, :]).astype(dtype)
    ekr = pair(rows(ek0), rows(ek0)).astype(dtype)

    eye2 = jnp.eye(2, dtype=dtype)
    Zbd_pp = jnp.stack([jnp.kron(eye2, Z_pp_m[c]) for c in range(C)])
    Zbd_mp = jnp.stack([jnp.kron(eye2, Z_mp_m[c]) for c in range(C)])
    blk = jnp.zeros((Np, Np), dtype)
    wct_c = wct.astype(dtype)[None, :]
    Zrw_pp = blk.at[N:, :N].set(Zr_pp_m.astype(dtype) * wct_c)[None]
    Zrw_mp = blk.at[N:, :N].set(Zr_mp_m.astype(dtype) * wct_c)[None]
    geom = _geom_tables(qp_mu_N.astype(dtype), wct.astype(dtype),
                        d_vec.astype(dtype), 2, dtype, ie=True)

    bp_tot = nR * s
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
        prefp = padp(prefp, 1)
        jp_pair = padp(jp_pair, 1)
        jm_pair = padp(jm_pair, 1)
        ekr = padp(ekr, 1, value=1.0)
    grid = (bp_pad // bb, nz)

    def vmem(shape):
        return pl.BlockSpec(shape, lambda i, z: (_I0,) * len(shape),
                            memory_space=pltpu.VMEM)

    zflag = jnp.zeros((nz, 8, 128), dtype).at[0].set(1.0)

    in_specs = [
        vmem((C, Np, Np)),                                       # Zbd_pp
        vmem((C, Np, Np)),                                       # Zbd_mp
        vmem((1, Np, Np)),                                       # Zrw_pp
        vmem((1, Np, Np)),                                       # Zrw_mp
        vmem((14, Np, Np)),                                      # geom
        pl.BlockSpec((1, 8, 128), lambda i, z: (z, _I0, _I0),
                     memory_space=pltpu.VMEM),                   # zflag
        pl.BlockSpec((1, C, bb, Np), lambda i, z: (z, _I0, i, _I0),
                     memory_space=pltpu.VMEM),                   # wrow
        pl.BlockSpec((1, bb, Np), lambda i, z: (z, i, _I0),
                     memory_space=pltpu.VMEM),                   # pref
        pl.BlockSpec((1, bb, Np), lambda i, z: (z, i, _I0),
                     memory_space=pltpu.VMEM),                   # Em1
        pl.BlockSpec((1, bb, Np), lambda i, z: (z, i, _I0),
                     memory_space=pltpu.VMEM),                   # dt
        pl.BlockSpec((1, bb, Np), lambda i, z: (z, i, _I0),
                     memory_space=pltpu.VMEM),                   # jp
        pl.BlockSpec((1, bb, Np), lambda i, z: (z, i, _I0),
                     memory_space=pltpu.VMEM),                   # jm_star
        pl.BlockSpec((1, bb, Np), lambda i, z: (z, i, _I0),
                     memory_space=pltpu.VMEM),                   # ekr
    ]
    mat_o = pl.BlockSpec((bb, Np, Np), lambda i, z: (i, _I0, _I0),
                         memory_space=pltpu.VMEM)
    vec_o = pl.BlockSpec((bb, Np), lambda i, z: (i, _I0),
                         memory_space=pltpu.VMEM)
    out_shapes = (jax.ShapeDtypeStruct((bp_pad, Np, Np), dtype),) * 4 + \
                 (jax.ShapeDtypeStruct((bp_pad, Np), dtype),) * 2

    kernel = partial(_rrs_kernel, nz=nz, ns_sched=ns_sched,
                     ns_inter=ns_inter, dot_mode=dot_mode)
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
    out = fn(Zbd_pp, Zbd_mp, Zrw_pp, Zrw_mp, geom, zflag, wrow, prefp,
             Em1p, dtp, jp_pair, jm_pair, ekr)
    if bp_pad != bp_tot:
        out = tuple(o[:bp_tot] for o in out)

    def ie_mat(o):
        return o.reshape(nR, s, Np, Np)[:, :, N:, :N]

    def ie_vec(o):
        return o.reshape(nR, s, Np)[:, :, N:]

    R_mp, R_pm, T_pp, T_mm, J_p, J_m = out
    return (ie_mat(R_mp), ie_mat(R_pm), ie_mat(T_pp), ie_mat(T_mm),
            ie_vec(J_p), ie_vec(J_m))
