"""Rotational Raman scattering (RRS) transport.

Behavioral reference: /root/reference/src/CoreRT/CoreKernel/
{elemental_inelastic.jl, doubling_inelastic.jl, interaction_inelastic.jl} and
Inelastic/raman_atmo_prop.jl.

Design. The inelastic field is first-order in the Raman coupling: for each
discrete Raman shift, light at source wavelength n0 = n1 + shift scatters
once inelastically and is otherwise transported elastically. Algebraically
the coupled two-wavelength problem is block-triangular,

    X(eps) = [[X(n0), 0], [eps*ieX, X(n1)]],

and every adding/doubling composition preserves that structure, so the ieX
blocks evolve by the product rule: in every operator product exactly one
factor is replaced by its ie-counterpart, factors to its LEFT evaluate at n1
and to its RIGHT at n0 (verified term-by-term against
doubling_inelastic.jl:74-143). This module implements that "bichromatic jet"
algebra on top of the elastic kernels:

* the n0-role of any elastic array is a masked ``jnp.roll`` along the
  spectral axis (uniform grid, integer shift offsets);
* the Raman shifts are a ``vmap`` axis over the ie-arrays — each shift is an
  independent (nSpec, N, N) problem in the same batched-GEMM shapes as the
  elastic solver;
* under spectral sharding this needs only a bounded halo of max|shift| grid
  points — the context-parallel analogue noted in SURVEY section 5.
"""

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .kernels import MATMUL_PRECISION, _bsolve, _exp, _expm1
from .kernels import _bmm as _bmm_exact

#: Precision of the inelastic-ladder dots. The ie field is FIRST-ORDER in
#: the Raman coupling — a ~1e-2 additive correction to the radiance — so a
#: bf16-class (~4e-3 relative) dot error lands at ~4e-5 of the total
#: signal, far inside the reference's own F32 gates (benchmarks.md
#: 0.3-0.5%). On TPU the default-precision dots run a single MXU pass
#: instead of six; CPU executes f32 exactly either way, so the test-suite
#: numerics are unchanged. Set VSM_IE_PRECISION=highest to force exact
#: dots (the bench parity study ran both — PERF.md r4).
IE_PRECISION = os.environ.get("VSM_IE_PRECISION", "default")


def _bmm(a, b):
    prec = None if IE_PRECISION == "default" else IE_PRECISION
    return jnp.matmul(a, b, precision=prec)


def _roll0(x, shift):
    """Value at the source wavelength n0 = n1 + shift, zero outside band."""
    S = x.shape[0]
    rolled = jnp.roll(x, -shift, axis=0)
    idx = jnp.arange(S)
    valid = ((idx + shift) >= 0) & ((idx + shift) < S)
    return rolled * valid.reshape((S,) + (1,) * (x.ndim - 1)).astype(x.dtype)


def _src_fixed0(x, shift):
    """Fixed-source map for vibrational Raman: the incident wavelength is
    grid point 0 (get_elem_rt_VS! convention, elemental_inelastic.jl:279);
    every target receives from it. ``shift`` is ignored."""
    return jnp.broadcast_to(x[0:1], x.shape)


def _mv(a, v):
    prec = None if IE_PRECISION == "default" else IE_PRECISION
    return jnp.einsum("sij,sj->si", a, v, precision=prec)


def _mv_exact(a, v):
    return jnp.einsum("sij,sj->si", a, v, precision=MATMUL_PRECISION)


class IEAdded(NamedTuple):
    """Per-shift homogeneous-layer ie operators, leading shift axis."""
    ier_mp: jnp.ndarray   # (nR, s, N, N)
    ier_pm: jnp.ndarray
    iet_pp: jnp.ndarray
    iet_mm: jnp.ndarray
    iejp: jnp.ndarray     # (nR, s, N)
    iejm: jnp.ndarray


class IEComposite(NamedTuple):
    ieR_mp: jnp.ndarray
    ieR_pm: jnp.ndarray
    ieT_pp: jnp.ndarray
    ieT_mm: jnp.ndarray
    ieJp: jnp.ndarray
    ieJm: jnp.ndarray


def zero_ie_composite(n_r, n_spec, N, dtype) -> IEComposite:
    zm = jnp.zeros((n_r, n_spec, N, N), dtype)
    zv = jnp.zeros((n_r, n_spec, N), dtype)
    return IEComposite(zm, zm, zm, zm, zv, zv)


def ie_elemental(shift, w_rr, fscatt, dtau, tau_sum, Z_pp_r, Z_mp_r,
                 qp_mu_N, wct, mu0, i_mu0_start, n_stokes, F0, fourier_w,
                 src_fn=_roll0):
    """Inelastic elemental operators for ONE Raman shift
    (get_elem_rt_RRS!, elemental_inelastic.jl:117-206; SFI kernel l.480-598).

    Args: shift (traced int), w_rr scalar Raman weight, fscatt (s,) Rayleigh
    scattering fraction, dtau (s,) total elemental depth, tau_sum (s,),
    Z_pp_r/Z_mp_r (N, N) Raman phase supermatrices, wct (N,) scaled weights.
    Returns (ier_mp, iet_pp, iejp, iejm) — reverse operators come from the
    D symmetry after doubling.
    """
    d1 = dtau                                     # target wavelength n1
    d0 = src_fn(dtau, shift)                      # source wavelength n0
    fsc0 = src_fn(fscatt, shift)
    valid = d0 > 0
    # w_rr may be a scalar (RRS: one weight per shift) or a per-target
    # vector (VS: weights scattered over the output grid)
    w_rr = jnp.broadcast_to(jnp.asarray(w_rr, dtau.dtype), dtau.shape)

    mu_i = qp_mu_N[:, None]
    mu_j = qp_mu_N[None, :]
    safe_d0 = jnp.where(valid, d0, 1.0)
    ratio = (d1 / safe_d0)[:, None, None]         # (s,1,1)
    pref = (w_rr * fsc0 * valid)[:, None, None]

    # f64 transcendentals only on (s, N)/(s,) precursors (see kernels.py
    # elemental: the (s, N, N) f64-exp form ran ~400x below roofline on TPU).
    Em1_1 = _expm1(-d1[:, None] / qp_mu_N[None, :])        # (s, N)
    Em1_0 = _expm1(-d0[:, None] / qp_mu_N[None, :])        # (s, N)
    E_0 = 1.0 + Em1_0                                      # exp(-d0/mu)

    # 1 - E1_i E0_j = -(Em1_1_i + Em1_0_j + Em1_1_i Em1_0_j) — same-sign sum
    one_m_EE = -(Em1_1[:, :, None] + Em1_0[:, None, :]
                 + Em1_1[:, :, None] * Em1_0[:, None, :])
    ier = (pref * Z_mp_r[None] * wct[None, None, :]
           * (1.0 / (mu_i / mu_j + ratio)) * one_m_EE)

    # Transmission: the reference's three-way degeneracy dance
    # (same-mu / same-dtau / generic, elemental_inelastic.jl:150-206)
    # collapses into ONE well-conditioned kernel:
    #   ediff / gen = E0_j (d0/mu_i) expm1(x)/x,  x = d0/mu_j - d1/mu_i
    # since ediff = E0_j expm1(x) and gen = x mu_i/d0 exactly. expm1(x)/x -> 1
    # as x -> 0 covers every degenerate limit smoothly.
    base = pref * Z_pp_r[None] * wct[None, None, :]
    x = d0[:, None, None] / mu_j - d1[:, None, None] / mu_i
    xr = jnp.where(x == 0.0, 1.0, jnp.expm1(x) / jnp.where(x == 0.0, 1.0, x))
    iet = base * (d0[:, None, None] / mu_i) * E_0[:, None, :] * xr

    # SFI sources: incident-wavelength quantities at n0
    ns = n_stokes
    sl = slice(i_mu0_start, i_mu0_start + ns)
    F0_0 = src_fn(F0.T, shift)                    # (s, ns)
    Zp_I0 = jnp.einsum("ik,sk->si", Z_pp_r[:, sl], F0_0,
                       precision=MATMUL_PRECISION)
    Zm_I0 = jnp.einsum("ik,sk->si", Z_mp_r[:, sl], F0_0,
                       precision=MATMUL_PRECISION)

    prefv = fourier_w * (w_rr * fsc0 * valid)[:, None]       # (s,1)
    mu_v = qp_mu_N[None, :]
    d1v, d0v = d1[:, None], d0[:, None]
    in_block = ((jnp.arange(qp_mu_N.shape[0]) >= i_mu0_start)
                & (jnp.arange(qp_mu_N.shape[0]) < i_mu0_start + ns)) | \
        (jnp.abs(qp_mu_N - mu0) <= 1e-9 * mu0)

    # Same unified kernel for the beam source; the source direction is mu_v
    # inside the solar block, mu0 outside.
    Em1_00 = _expm1(-d0 / mu0)                    # (s,)
    mu_s = jnp.where(in_block, qp_mu_N, mu0)[None, :]
    E0_s = jnp.where(in_block[None, :], E_0, (1.0 + Em1_00)[:, None])
    y = d0v / mu_s - d1v / mu_v
    yr = jnp.where(y == 0.0, 1.0, jnp.expm1(y) / jnp.where(y == 0.0, 1.0, y))
    iejp = prefv * Zp_I0 * (d0v / mu_v) * E0_s * yr

    one_m_EE0 = -(Em1_1 + Em1_00[:, None] + Em1_1 * Em1_00[:, None])
    iejm = prefv * Zm_I0 * (1.0 / (mu_v / mu0 + d1v / safe_d0[:, None])) * \
        one_m_EE0

    att0 = _exp(-src_fn(tau_sum, shift) / mu0)[:, None]
    return ier, iet, iejp * att0, iejm * att0


def _ie_prec():
    return None if IE_PRECISION == "default" else IE_PRECISION


def _L(a, X):
    """Elastic-left product a(s,N,N) @ X(nR,s,N,N) WITHOUT broadcasting a
    to the shift axis: one wide batched GEMM per spectral point (round-4
    profiler fix — the vmapped form materialized (nR,s,N,N) copies of
    every elastic operand)."""
    return jnp.einsum("snm,rsml->rsnl", a, X, precision=_ie_prec())


def _Lv(a, x):
    return jnp.einsum("snm,rsm->rsn", a, x, precision=_ie_prec())


def _B(X, Y):
    """Per-shift batched product (both operands carry the shift axis)."""
    return jnp.einsum("rsnm,rsml->rsnl", X, Y, precision=_ie_prec())


def _Bv(X, y):
    return jnp.einsum("rsnm,rsm->rsn", X, y, precision=_ie_prec())


def _roll_all(src_fn, shifts, *arrays):
    """Per-shift source-wavelength views (nR, ...) of elastic arrays.

    When ``shifts`` is a static tuple and the source map is the standard
    RRS roll, each per-shift view is a compile-time SLICE of one
    zero-padded copy (out-of-band targets fall on the padding, so the
    validity mask is free) — the traced-shift form lowers to gathers,
    measured at 40% of the whole RRS solve (PERF.md r4). Falls back to
    the vmapped traced form otherwise (VS fixed-source mode)."""
    if isinstance(shifts, tuple) and src_fn is _roll0:
        M = max(max(abs(int(sh)) for sh in shifts), 1)
        outs = []
        for a in arrays:
            S = a.shape[0]
            widths = [(M, M)] + [(0, 0)] * (a.ndim - 1)
            ap = jnp.pad(a, widths)
            outs.append(jnp.stack([
                jax.lax.dynamic_slice_in_dim(ap, M + int(sh), S, axis=0)
                for sh in shifts]))
        return tuple(outs)
    shifts_arr = jnp.asarray(shifts)
    return tuple(jax.vmap(lambda sh, a=a: src_fn(a, sh))(shifts_arr)
                 for a in arrays)


def ie_doubling_step(r, t, jp, jm, ek, gp, tt_gp, ie_carry, shifts,
                     src_fn=_roll0):
    """One doubling step of the (starred) ie quantities given the elastic
    starred state of the same step (doubling_inelastic.jl:74-143).

    ie_carry = (ier*, iet, iejp, iejm*) with leading shift axis; r/jm are the
    starred elastic quantities; jp/jm are the solar source slot (s, N).

    TPU layout discipline (round-4 profiler finding): every product with an
    elastic LEFT factor is a wide einsum (_L/_Lv — no (nR, s, N, N)
    broadcasts of elastic operands), and rolled per-shift elastic products
    are built by rolling the PRE-MULTIPLIED elastic arrays (roll commutes
    with s-pointwise matrix products: gp0 @ t0 = R0(gp @ t)), so only five
    matrix rolls materialize per step instead of per-product copies."""
    ier, iet, iejp, iejm = ie_carry
    j1p = jp * ek[:, None]
    j1m = jm * ek[:, None]
    tmp1 = _mv_exact(gp, jp + _mv_exact(r, j1m))
    tmp2 = _mv_exact(gp, j1m + _mv_exact(r, jp))
    gp_t = _bmm_exact(gp, t)
    gp_r = _bmm_exact(gp, r)
    gp_r_t = _bmm_exact(gp_r, t)

    (r0, t0, G_t0, G_rt0, G_r0) = _roll_all(
        src_fn, shifts, r, t, gp_t, gp_r_t, gp_r)
    (ek0, j1m0, jp0, tmp1_0, tmp2_0) = _roll_all(
        src_fn, shifts, ek, j1m, jp, tmp1, tmp2)

    iej1p = iejp * ek0[:, :, None]
    iej1m = iejm * ek0[:, :, None]
    mix = _L(r, ier) + _B(ier, r0)               # (r r)_ie

    iejp_new = iej1p + _Lv(tt_gp, iejp + _Lv(r, iej1m) + _Bv(ier, j1m0)
                           + _Bv(mix, tmp1_0)) + _Bv(iet, tmp1_0)
    iejm_new = iejm + _Lv(tt_gp, iej1m + _Bv(ier, jp0) + _Lv(r, iejp)
                          + _Bv(mix, tmp2_0)) + _Bv(iet, tmp2_0)

    iet_new = _L(tt_gp, iet + _B(mix, G_t0)) + _B(iet, G_t0)
    ier_new = ier + _B(iet, G_rt0) + \
        _L(tt_gp, _L(r, iet) + _B(ier + _B(mix, G_r0), t0))
    return ier_new, iet_new, iejp_new, iejm_new


def ie_interaction(comp_el, add_el, comp_ie: IEComposite, add_ie: IEAdded,
                   shifts, src_fn=_roll0) -> IEComposite:
    """ie-part of the adding step, derived by the bichromatic product rule
    from kernels.interaction() (behavioral reference
    interaction_inelastic.jl). Elastic comp/add are PRE-interaction states;
    elastic sources are the solar slot (s, N)."""
    N = comp_el["T_pp"].shape[-1]
    eye = jnp.eye(N, dtype=comp_el["T_pp"].dtype)
    eye_b = jnp.broadcast_to(eye, comp_el["T_pp"].shape)

    r_a, rpm_a = add_el["r_mp"], add_el["r_pm"]
    tpp_a, tmm_a = add_el["t_pp"], add_el["t_mm"]
    jp_a, jm_a = add_el["j0_p"], add_el["j0_m"]
    Rmp_c, Rpm_c = comp_el["R_mp"], comp_el["R_pm"]
    Tpp_c, Tmm_c = comp_el["T_pp"], comp_el["T_mm"]
    Jp_c, Jm_c = comp_el["J0_p"], comp_el["J0_m"]

    inv1 = _bsolve(eye_b - _bmm_exact(r_a, Rpm_c), eye_b)
    T01 = _bmm_exact(Tmm_c, inv1)
    inv2 = _bsolve(eye_b - _bmm_exact(Rpm_c, r_a), eye_b)
    T21 = _bmm_exact(tpp_a, inv2)

    # Elastic precomputes rolled as PRODUCTS (roll commutes with
    # s-pointwise products) — the round-4 wide-einsum restructure; see
    # ie_doubling_step's layout discipline note.
    rT = _bmm_exact(r_a, Tpp_c)
    Rt = _bmm_exact(Rpm_c, tmm_a)
    u1 = _mv_exact(r_a, Jp_c) + jm_a
    u2 = Jp_c + _mv_exact(Rpm_c, jm_a)

    (Rpm0, inv1_0, rT0, tmm0, ra0, inv2_0, Tpp0, Rt0) = _roll_all(
        src_fn, shifts, Rpm_c, inv1, rT, tmm_a, r_a, inv2, Tpp_c, Rt)
    (u1_0, Jp0, u2_0, jm0) = _roll_all(src_fn, shifts, u1, Jp_c, u2, jm_a)

    (ieR_mp, ieR_pm, ieT_pp, ieT_mm, ieJp, ieJm) = comp_ie
    (ier_mp, ier_pm, iet_pp, iet_mm, iejp, iejm) = add_ie

    dinv1 = _L(inv1, _B(_B(ier_mp, Rpm0) + _L(r_a, ieR_pm), inv1_0))
    dT01 = _B(ieT_mm, inv1_0) + _L(Tmm_c, dinv1)

    ieJm_new = ieJm + _Bv(dT01, u1_0) + \
        _Lv(T01, _Bv(ier_mp, Jp0) + _Lv(r_a, ieJp) + iejm)
    ieR_mp_new = ieR_mp + _B(dT01, rT0) + \
        _L(T01, _B(ier_mp, Tpp0) + _L(r_a, ieT_pp))
    ieT_mm_new = _B(dT01, tmm0) + _L(T01, iet_mm)

    dinv2 = _L(inv2, _B(_B(ieR_pm, ra0) + _L(Rpm_c, ier_mp), inv2_0))
    dT21 = _B(iet_pp, inv2_0) + _L(tpp_a, dinv2)

    ieJp_new = iejp + _Bv(dT21, u2_0) + \
        _Lv(T21, ieJp + _Bv(ieR_pm, jm0) + _Lv(Rpm_c, iejm))
    ieT_pp_new = _B(dT21, Tpp0) + _L(T21, ieT_pp)
    ieR_pm_new = ier_pm + _B(dT21, Rt0) + \
        _L(T21, _B(ieR_pm, tmm0) + _L(Rpm_c, iet_mm))

    return IEComposite(ieR_mp_new, ieR_pm_new, ieT_pp_new, ieT_mm_new,
                       ieJp_new, ieJm_new)


def ie_star(ie_fields, d_vec):
    """Star ier and iejm before doubling (apply_D_elemental_RRS! /
    elemental SFI D flip): rows with Stokes parity > 2 negate."""
    ier, iet, iejp, iejm = ie_fields
    return (ier * d_vec[None, None, :, None], iet, iejp,
            iejm * d_vec[None, None, :])


def ie_unstar(ie_fields, d_vec) -> IEAdded:
    """Unstar + reconstruct reverse ie operators via the parity relation
    (apply_D_matrix_IE!, doubling_inelastic.jl:159)."""
    ier, iet, iejp, iejm = ie_fields
    sgn = jnp.outer(d_vec, d_vec)
    ier_mp = ier * d_vec[None, None, :, None]
    iejm_out = iejm * d_vec[None, None, :]
    return IEAdded(ier_mp, sgn * ier_mp, iet, sgn * iet, iejp, iejm_out)


def ie_added_zero(n_r, n_spec, N, dtype) -> IEAdded:
    zm = jnp.zeros((n_r, n_spec, N, N), dtype)
    zv = jnp.zeros((n_r, n_spec, N), dtype)
    return IEAdded(zm, zm, zm, zm, zv, zv)


# ---------------------------------------------------------------------------
# Combined elastic + inelastic doubling and the RRS driver
# ---------------------------------------------------------------------------

from functools import partial as _partial

import numpy as _np

from .kernels import AddedLayer as _AddedLayer
from .kernels import CompositeLayer as _CompositeLayer
from .kernels import elemental as _elemental
from .kernels import identity_composite as _identity_composite
from .kernels import interaction as _interaction
from .types import SolverConfig, SolverInputs, stokes_d_vector


def doubling_rs(r_mp, t_pp, j0_p, j0_m, expk, ie_fields, ndoubl: int,
                d_vec, shifts, src_fn=_roll0):
    """Elastic + inelastic doubling (doubling_helper! RRS,
    doubling_inelastic.jl:13-164). Elastic sources are (s, N) solar vectors.
    Returns (AddedLayer with K=1 sources, IEAdded)."""
    dtype = r_mp.dtype
    n_spec, N = j0_p.shape
    eye = jnp.eye(N, dtype=dtype)
    sgn = jnp.outer(d_vec, d_vec)

    ie0 = ie_star(ie_fields, d_vec)

    if ndoubl == 0:
        add = _AddedLayer(r_mp, sgn * r_mp, t_pp, sgn * t_pp,
                          j0_p[..., None], j0_m[..., None])
        return add, ie_unstar(ie0, d_vec)

    r = r_mp * d_vec[None, :, None]
    jm = j0_m * d_vec[None, :]
    jp, t = j0_p, t_pp

    def step(carry, _):
        r, t, jp, jm, ek, ier, iet, iejp, iejm = carry
        gp = _bsolve(eye[None] - _bmm_exact(r, r),
                     jnp.broadcast_to(eye, r.shape))
        tt_gp = _bmm_exact(t, gp)
        # ie update FIRST (uses the pre-update elastic state)
        ier, iet, iejp, iejm = ie_doubling_step(
            r, t, jp, jm, ek, gp, tt_gp, (ier, iet, iejp, iejm), shifts,
            src_fn)
        # elastic update (rt_helpers.jl:130-166)
        j1p = jp * ek[:, None]
        j1m = jm * ek[:, None]
        jm_new = jm + _mv_exact(tt_gp, j1m + _mv_exact(r, jp))
        jp_new = j1p + _mv_exact(tt_gp, jp + _mv_exact(r, j1m))
        r_new = r + _bmm_exact(tt_gp, _bmm_exact(r, t))
        t_new = _bmm_exact(tt_gp, t)
        return (r_new, t_new, jp_new, jm_new, ek * ek,
                ier, iet, iejp, iejm), None

    # (Round-4 note: a Python unroll of this scan was measured
    # wall-neutral on TPU — XLA aliases the scan carries — so the scan
    # stays for its ~2x smaller compile.)
    carry = (r, t, jp, jm, expk) + tuple(ie0)
    carry, _ = jax.lax.scan(step, carry, None, length=ndoubl)
    (r, t, jp, jm, _, ier, iet, iejp, iejm) = carry

    r_out = r * d_vec[None, :, None]
    jm_out = jm * d_vec[None, :]
    add = _AddedLayer(r_out, sgn * r_out, t, sgn * t,
                      jp[..., None], jm_out[..., None])
    return add, ie_unstar((ier, iet, iejp, iejm), d_vec)


def _comp_dict(comp: _CompositeLayer):
    return {"R_mp": comp.R_mp, "R_pm": comp.R_pm, "T_pp": comp.T_pp,
            "T_mm": comp.T_mm, "J0_p": comp.J0_p[..., 0],
            "J0_m": comp.J0_m[..., 0]}


def _add_dict(add: _AddedLayer):
    return {"r_mp": add.r_mp, "r_pm": add.r_pm, "t_pp": add.t_pp,
            "t_mm": add.t_mm, "j0_p": add.j0_p[..., 0],
            "j0_m": add.j0_m[..., 0]}


@_partial(jax.jit, static_argnames=("config", "shifts", "src_fn"))
def rt_solve_rrs(inputs: SolverInputs, config: SolverConfig,
                 shifts, w_shifts, Z_r_pp, Z_r_mp, fscatt, src_fn=_roll0):
    """Full RRS solve (reference rt_run(RRS(), model), rt_run.jl:238-539 with
    the inelastic kernels). Returns dict with the elastic R/T and the
    inelastic ieR/ieT (each (nVZA, nStokes, nSpec)).

    Extra args: shifts — STATIC tuple of nR int index offsets (compile-time
    shifts turn every source-wavelength roll into plain slices; the traced
    form gathered — 40% of the solve, PERF.md r4); w_shifts (nR,)
    normalized Raman weights; Z_r_pp/Z_r_mp (n_m, N, N) Raman phase
    supermatrices; fscatt (Nz, nSpec) Rayleigh fraction of layer
    scattering.
    """
    dtype = jnp.dtype(config.dtype)
    n_spec, N, nz = config.n_spec, config.N, config.nz
    ns = config.n_stokes
    n_r = len(shifts)
    shifts_arr = jnp.asarray(shifts, jnp.int32)

    qp_mu_N = inputs.qp_mu_N.astype(dtype)
    wt_mu_N = inputs.wt_mu_N.astype(dtype)
    mu0 = qp_mu_N[config.i_mu0_start]
    d_vec = jnp.asarray(stokes_d_vector(ns, config.nquad), dtype)

    tau = inputs.tau.astype(dtype)
    scat_w = inputs.scat_w.astype(dtype)
    F0 = inputs.F0.astype(dtype)
    surf_spec = inputs.surf_spec.astype(dtype)
    fscatt = fscatt.astype(dtype)
    w_shifts = w_shifts.astype(dtype)

    tau_sum = jnp.concatenate(
        [jnp.zeros((1, n_spec), dtype), jnp.cumsum(tau, axis=0)], axis=0)

    nvza = len(config.vza_idx)
    vza_rows = _np.asarray(
        [[v * ns + k for k in range(ns)] for v in config.vza_idx])
    n_m = config.m_max + 1
    fourier_w_all = jnp.asarray([0.5] + [0.25] * (n_m - 1), dtype)

    def layer_step(carry, layer_data, *, Z_pp_m, Z_mp_m, Z_r_pp_m,
                   Z_r_mp_m, fw):
        comp, comp_ie = carry
        tau_z, scat_w_z, tau_sum_z, fscatt_z = layer_data
        dtau = tau_z / (2 ** config.ndoubl)

        from .solver import _mixed_omega_Z
        wZ_pp = _mixed_omega_Z(scat_w_z, Z_pp_m, tau_z)
        wZ_mp = _mixed_omega_Z(scat_w_z, Z_mp_m, tau_z)
        r_mp, t_pp, j_p, j_m = _elemental(
            wZ_pp, wZ_mp, dtau, tau_sum_z, qp_mu_N, wt_mu_N, mu0,
            config.i_mu0_start, ns, F0, fw)

        wct = fw * wt_mu_N
        ie_el = jax.vmap(
            lambda sh, w: ie_elemental(sh, w, fscatt_z, dtau, tau_sum_z,
                                       Z_r_pp_m, Z_r_mp_m,
                                       qp_mu_N, wct, mu0, config.i_mu0_start,
                                       ns, F0, fw, src_fn)
        )(shifts_arr, w_shifts)

        expk = _exp(-dtau / mu0)
        add, add_ie = doubling_rs(r_mp, t_pp, j_p, j_m, expk, ie_el,
                                  config.ndoubl, d_vec, shifts, src_fn)

        comp_ie_new = ie_interaction(_comp_dict(comp), _add_dict(add),
                                     comp_ie, add_ie, shifts, src_fn)
        comp_new = _interaction(comp, add)
        return (comp_new, comp_ie_new), None

    def moment_body(carry, xs):
        R, T, ieR, ieT = carry
        (Z_pp_m, Z_mp_m, Z_r_pp_m, Z_r_mp_m, surf_r_m, surf_j_m,
         direct_m, vza_w_m, fw, is_m0) = xs

        step = _partial(layer_step, Z_pp_m=Z_pp_m, Z_mp_m=Z_mp_m,
                        Z_r_pp_m=Z_r_pp_m, Z_r_mp_m=Z_r_mp_m, fw=fw)

        comp = _identity_composite(n_spec, N, dtype, 1)
        comp_ie = zero_ie_composite(n_r, n_spec, N, dtype)
        (comp, comp_ie), _ = jax.lax.scan(
            step, (comp, comp_ie),
            (tau, scat_w, tau_sum[:nz], fscatt))

        from .solver import _surface_layer
        sif0 = inputs.sif_spec.astype(dtype)
        surf = _surface_layer(surf_r_m, surf_j_m, direct_m, surf_spec, F0,
                              tau_sum[nz], mu0, sif0, is_m0, config, dtype)
        add_ie0 = ie_added_zero(n_r, n_spec, N, dtype)
        comp_ie = ie_interaction(_comp_dict(comp), _add_dict(surf),
                                 comp_ie, add_ie0, shifts, src_fn)
        comp = _interaction(comp, surf)

        J0_m = comp.J0_m[..., 0]
        J0_p = comp.J0_p[..., 0]
        ieJm_tot = comp_ie.ieJm.sum(axis=0)      # sum over Raman shifts
        ieJp_tot = comp_ie.ieJp.sum(axis=0)

        w3 = vza_w_m[:, :, None]
        R = R + jnp.transpose(J0_m[:, vza_rows], (1, 2, 0)) * w3
        T = T + jnp.transpose(J0_p[:, vza_rows], (1, 2, 0)) * w3
        ieR = ieR + jnp.transpose(ieJm_tot[:, vza_rows], (1, 2, 0)) * w3
        ieT = ieT + jnp.transpose(ieJp_tot[:, vza_rows], (1, 2, 0)) * w3
        return (R, T, ieR, ieT), None

    z0 = jnp.zeros((nvza, ns, n_spec), dtype)
    xs = (inputs.Z_pp.astype(dtype), inputs.Z_mp.astype(dtype),
          Z_r_pp.astype(dtype), Z_r_mp.astype(dtype),
          inputs.surf_r.astype(dtype), inputs.surf_j_m.astype(dtype),
          inputs.surf_direct_m.astype(dtype), inputs.vza_w.astype(dtype),
          fourier_w_all, jnp.arange(n_m) == 0)
    (R, T, ieR, ieT), _ = jax.lax.scan(moment_body, (z0, z0, z0, z0), xs)
    return {"R": R, "T": T, "ieR": ieR, "ieT": ieT}


@_partial(jax.jit, static_argnames=("config", "shifts"))
def rt_solve_rrs_fused(inputs: SolverInputs, config: SolverConfig,
                       shifts, w_shifts, Z_r_pp, Z_r_mp, fscatt):
    """Band-kernel RRS solve: the elastic composite comes from the elastic
    fused band kernel (ops/fused_band.py, packed) and the ENTIRE inelastic
    ladder + per-layer adding runs in the block-bichromatic band kernel
    (ops/fused_rrs.py — one pack=2 problem per (shift, point) pair); only
    the surface step runs the XLA ie_interaction. Same returns as
    rt_solve_rrs. Requires the standard RRS roll source map (static
    integer shifts).
    """
    dtype = jnp.dtype(config.dtype)
    n_spec, N, nz = config.n_spec, config.N, config.nz
    ns = config.n_stokes
    n_r = len(shifts)
    p = config.pack

    qp_mu_N = inputs.qp_mu_N.astype(dtype)
    wt_mu_N = inputs.wt_mu_N.astype(dtype)
    mu0 = qp_mu_N[config.i_mu0_start]
    d_vec = jnp.asarray(stokes_d_vector(ns, config.nquad), dtype)

    tau = inputs.tau.astype(dtype)
    scat_w = inputs.scat_w.astype(dtype)
    F0 = inputs.F0.astype(dtype)
    surf_spec = inputs.surf_spec.astype(dtype)
    fscatt = fscatt.astype(dtype)
    w_shifts = w_shifts.astype(dtype)

    tau_sum = jnp.concatenate(
        [jnp.zeros((1, n_spec), dtype), jnp.cumsum(tau, axis=0)], axis=0)

    # f64-accurate transcendental precursors, shared by both kernels
    # (identical to solver.rt_solve's use_band block).
    dtau_z = tau / (2.0 ** config.ndoubl)
    Em1_pre = _expm1(-dtau_z[:, :, None] / qp_mu_N[None, None, :])
    Em10_pre = _expm1(-dtau_z / mu0)
    att_pre = _exp(-tau_sum[:nz] / mu0)
    ek_pre = _exp(-dtau_z / mu0)

    # ie ladder at its own (coarser) resolution — see
    # ops/fused_rrs.ie_ladder_resolution. VSM_IE_FULLRES=1 forces the
    # elastic resolution (parity probing).
    from ..ops.fused_rrs import ie_ladder_resolution
    if os.environ.get("VSM_IE_FULLRES"):
        ie_nd, ie_sched, ie_inter = (config.ndoubl,
                                     config.ns_sched or None,
                                     config.ns_inter)
    else:
        ie_nd, ie_sched, ie_inter = ie_ladder_resolution(
            config.ndoubl, config.ns_sched or None, config.ns_inter)
    if ie_nd != config.ndoubl:
        dtau_ie = tau / (2.0 ** ie_nd)
        Em1_ie = _expm1(-dtau_ie[:, :, None] / qp_mu_N[None, None, :])
        Em10_ie = _expm1(-dtau_ie / mu0)
        ek_ie = _exp(-dtau_ie / mu0)
    else:
        Em1_ie, Em10_ie, ek_ie = Em1_pre, Em10_pre, ek_pre
    idx = jnp.arange(N)
    is_I_vec = ((idx % ns) == 0).astype(dtype)
    in_blk_vec = (((idx >= config.i_mu0_start)
                   & (idx < config.i_mu0_start + ns))
                  | (jnp.abs(qp_mu_N - mu0) <= 1e-9 * mu0)).astype(dtype)

    nvza = len(config.vza_idx)
    vza_rows = _np.asarray(
        [[v * ns + k for k in range(ns)] for v in config.vza_idx])
    n_m = config.m_max + 1
    fourier_w_all = jnp.asarray([0.5] + [0.25] * (n_m - 1), dtype)

    # Shift chunking: at nR * nSpec pairs the block composites are
    # 4 x (nR s, 2N, 2N) — process the (independent) shifts in equal-size
    # chunks so HBM stays bounded at any band width. Equal sizes keep one
    # kernel compile; the pad chunk uses shift 0 with weight 0 (a
    # contributes-nothing pair).
    n_rc = max(1, min(n_r, 32768 // max(n_spec, 1)))
    n_chunks = -(-n_r // n_rc)
    shifts_pad = tuple(shifts) + (0,) * (n_chunks * n_rc - n_r)
    w_pad = jnp.concatenate(
        [w_shifts, jnp.zeros(n_chunks * n_rc - n_r, dtype)])

    from ..ops.fused_band import fused_moment
    from ..ops.fused_rrs import fused_moment_rrs
    from ..ops.packing import unpack_mat, unpack_vec
    from .solver import _surface_layer

    def moment_body(carry, xs):
        R, T, ieR, ieT = carry
        (Z_pp_m, Z_mp_m, Z_r_pp_m, Z_r_mp_m, surf_r_m, surf_j_m,
         direct_m, vza_w_m, fw, is_m0) = xs

        comp_p = fused_moment(
            Z_pp_m, Z_mp_m, tau, scat_w, Em1_pre, Em10_pre, att_pre,
            ek_pre, jnp.zeros_like(tau), F0 * fw, qp_mu_N, fw * wt_mu_N,
            d_vec, is_I_vec, in_blk_vec, ndoubl=config.ndoubl,
            ns_sched=config.ns_sched or None, ns_inter=config.ns_inter,
            pack=p, n_stokes=ns, i_mu0_start=config.i_mu0_start,
            n_sources=1, block=config.band_block,
            dot_mode=config.dot_mode)
        comp = _CompositeLayer(*(unpack_mat(a, p) for a in comp_p[:4]),
                               *(unpack_vec(a, p) for a in comp_p[4:]))

        sif0 = inputs.sif_spec.astype(dtype)
        surf = _surface_layer(surf_r_m, surf_j_m, direct_m, surf_spec, F0,
                              tau_sum[nz], mu0, sif0, is_m0, config, dtype)

        ieJm_tot = jnp.zeros((n_spec, N), dtype)
        ieJp_tot = jnp.zeros((n_spec, N), dtype)
        add_ie0 = ie_added_zero(n_rc, n_spec, N, dtype)
        comp_d, surf_d = _comp_dict(comp), _add_dict(surf)
        for c in range(n_chunks):
            sh_c = shifts_pad[c * n_rc:(c + 1) * n_rc]
            w_c = jax.lax.dynamic_slice_in_dim(w_pad, c * n_rc, n_rc)
            comp_ie = IEComposite(*fused_moment_rrs(
                Z_pp_m, Z_mp_m, Z_r_pp_m, Z_r_mp_m, tau, scat_w, Em1_ie,
                Em10_ie, att_pre, ek_ie, fscatt, sh_c, w_c, F0 * fw,
                qp_mu_N, fw * wt_mu_N, d_vec, in_blk_vec,
                ndoubl=ie_nd, ns_sched=ie_sched,
                ns_inter=ie_inter, n_stokes=ns,
                i_mu0_start=config.i_mu0_start, block=config.band_block,
                dot_mode=config.dot_mode))
            comp_ie = ie_interaction(comp_d, surf_d, comp_ie, add_ie0,
                                     sh_c, _roll0)
            ieJm_tot = ieJm_tot + comp_ie.ieJm.sum(axis=0)
            ieJp_tot = ieJp_tot + comp_ie.ieJp.sum(axis=0)

        comp = _interaction(comp, surf)
        J0_m = comp.J0_m[..., 0]
        J0_p = comp.J0_p[..., 0]

        w3 = vza_w_m[:, :, None]
        R = R + jnp.transpose(J0_m[:, vza_rows], (1, 2, 0)) * w3
        T = T + jnp.transpose(J0_p[:, vza_rows], (1, 2, 0)) * w3
        ieR = ieR + jnp.transpose(ieJm_tot[:, vza_rows], (1, 2, 0)) * w3
        ieT = ieT + jnp.transpose(ieJp_tot[:, vza_rows], (1, 2, 0)) * w3
        return (R, T, ieR, ieT), None

    z0 = jnp.zeros((nvza, ns, n_spec), dtype)
    xs = (inputs.Z_pp.astype(dtype), inputs.Z_mp.astype(dtype),
          Z_r_pp.astype(dtype), Z_r_mp.astype(dtype),
          inputs.surf_r.astype(dtype), inputs.surf_j_m.astype(dtype),
          inputs.surf_direct_m.astype(dtype), inputs.vza_w.astype(dtype),
          fourier_w_all, jnp.arange(n_m) == 0)
    (R, T, ieR, ieT), _ = jax.lax.scan(moment_body, (z0, z0, z0, z0), xs)
    return {"R": R, "T": T, "ieR": ieR, "ieT": ieT}


def inelastic_setup(model, i_band: int = 0, mode: str = "RRS"):
    """Shared setup for every inelastic driver (TOA/BOA, multisensor):
    returns (inputs, config, shifts, w_shifts, Z_r_pp, Z_r_mp, fscatt,
    src_fn)."""
    import numpy as np

    from ..inelastic.rrs_setup import greek_raman, rrs_redistribution
    from ..scattering.zmatrix import compute_Z_moments

    band = model.bands[i_band]
    inputs, config = model.build_band(i_band, rrs=True)

    src_fn = _roll0
    if mode == "RRS":
        shifts, w_shifts, _ = rrs_redistribution(band.nu_grid)
        if len(shifts) == 0:
            raise ValueError(
                "spectral grid too narrow/coarse for any rotational-"
                "Raman shift (lines span ~ +-200 cm^-1)")
        # Use the band's Cabannes fraction for the weight normalization so
        # the elastic + inelastic split is consistent with the elastic path.
        w_shifts = w_shifts * (1.0 - band.pi_cabannes) / w_shifts.sum()
    elif mode in ("VS_0to1", "VS_1to0"):
        from ..inelastic.vs_setup import vs_redistribution
        w_targets, _, _ = vs_redistribution(band.nu_grid, mode)
        if not np.any(w_targets > 0):
            raise ValueError(
                f"no {mode} Raman line lands on the scattered band; build "
                "the grid with vs_setup.vs_band_grid (first point = "
                "incident wavelength)")
        shifts = np.zeros(1, dtype=np.int32)      # single fixed-source slot
        w_shifts = w_targets[None, :]             # (1, nSpec) target weights
        src_fn = _src_fixed0
    else:
        raise ValueError(f"unknown inelastic mode {mode!r}")

    pol = model.params.polarization
    gk_r = greek_raman()
    n_m = config.m_max + 1
    N = config.N
    Z_r_pp = np.zeros((n_m, N, N))
    Z_r_mp = np.zeros((n_m, N, N))
    for m in range(n_m):
        Z_r_pp[m], Z_r_mp[m] = compute_Z_moments(pol, model.quad.qp_mu,
                                                 gk_r, m)

    # Rayleigh fraction of layer scattering (fScattRayleigh,
    # compEffectiveLayerProperties.jl:56): tau_rayl / (tau_rayl + tau_aer).
    tau_scat_mix = band.tau_rayl.T.copy()          # (Nz, s)
    for aer in band.aerosols:
        prof = np.asarray(aer.tau_profile)
        tau_scat_mix = tau_scat_mix + (prof[:, None] if prof.ndim == 1
                                       else prof.T)
    fscatt = band.tau_rayl.T / np.where(tau_scat_mix > 0, tau_scat_mix, 1.0)

    return (inputs, config, tuple(int(v) for v in shifts),
            jnp.asarray(w_shifts), jnp.asarray(Z_r_pp), jnp.asarray(Z_r_mp),
            jnp.asarray(fscatt), src_fn)


def rt_run_inelastic(model, i_band: int = 0, mode: str = "RRS"):
    """User-facing inelastic forward run (reference rt_run(RS_type, model)
    for RS_type in RRS / VS_0to1 / VS_1to0).

    mode="RRS": rotational Raman — every spectral point exchanges with its
    rotational-line neighborhood (index-shift redistribution).
    mode="VS_0to1"/"VS_1to0": vibrational Raman — the FIRST grid point is
    the incident wavelength; the rest of the grid is the scattered band
    (reference VS convention, elemental_inelastic.jl:279-294). Build such
    grids with inelastic.vs_setup.vs_band_grid.

    Returns (R, T, ieR, ieT): the elastic radiance factors and the
    inelastic contributions, each (nVZA, nStokes, nSpec). Total = R + ieR.
    """
    import numpy as np

    (inputs, config, shifts, w_shifts, Z_r_pp, Z_r_mp, fscatt,
     src_fn) = inelastic_setup(model, i_band, mode)
    if config.fused and src_fn is _roll0:
        # TPU product path: block-bichromatic band kernel (ops/fused_rrs).
        # VS modes keep the XLA path (fixed-source map, not a roll).
        out = rt_solve_rrs_fused(inputs, config, shifts, w_shifts,
                                 Z_r_pp, Z_r_mp, fscatt)
    else:
        out = rt_solve_rrs(inputs, config, shifts, w_shifts, Z_r_pp, Z_r_mp,
                           fscatt, src_fn=src_fn)
    return (np.asarray(out["R"]), np.asarray(out["T"]),
            np.asarray(out["ieR"]), np.asarray(out["ieT"]))
