"""Fused Pallas TPU kernels for the adding-doubling hot loop.

The reference's performance layer is CUBLAS batched LU + GEMM chains over
HBM-resident (N, N, nSpec) operators (/root/reference/ext/
gpu_batched_cuda.jl:133-233).  On TPU the equivalent XLA program pays two
costs: every doubling step round-trips ~17 (s, N, N) arrays through HBM,
and each batched (N<=64)-matrix GEMM pads to a full 128x128 MXU tile
(measured ~2.4 TF/s effective on TPU v5e — the padding model 197/6 passes
x (52/128)^2 predicts exactly that).  These kernels attack both:

* the layer state (r, t, source vectors) stays resident in VMEM across the
  *entire* doubling ladder and the interaction (adding) step, so HBM sees
  one read + one write per layer instead of one per GEMM;
* the spectral batch can be block-diagonally PACKED (ops/packing.py):
  p = floor(128/N) spectral points share one (pN, pN) operator, lifting
  MXU tile utilization by ~p^2 (52 -> 104 doubles the effective FLOP rate);
  all the adding-doubling algebra is closed over block-diagonal matrices,
  so the kernels run unchanged on packed operands;
* the geometric-series factor (I - S)^-1 is a Newton-Schulz iteration
  (pure MXU dots, quadratic convergence for rho(S) < 1 — every RT system
  here is I - product-of-reflections) with a PER-DOUBLING-STEP iteration
  schedule: early ladder steps have rho(r r) ~ (dtau)^2 ~ 1e-6 and need one
  iteration, only the last steps near the full-layer reflectivity need
  more.  The schedule is derived per scene from a host-side spectral-radius
  probe (ops/ns_schedule.py) — replacing the fixed worst-case 6+2 count;
* the second interaction inverse is eliminated entirely with the
  push-through identity (I - B A)^-1 = I + B (I - A B)^-1 A.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Fallback Newton-Schulz iterations for (I - S)^-1 when no scene-derived
#: schedule is supplied: error rho^(2^(k+1)); k = 6 reaches rho^128
#: (< 5e-13 even at rho = 0.8, a conservative-scattering cloud deck).
NS_ITERS = 6

#: Spectral points per Pallas program. 16 keeps ~12 live (B, N, N) f32
#: buffers (N <= 64 pads to (B, 64, 128) tiles) comfortably inside VMEM
#: with pipelining headroom.
DEFAULT_BLOCK = 16


_I0 = np.int32(0)   # index-map literals must stay i32 under jax x64 mode

#: Raise the scoped-VMEM budget: the default 16 MiB limit counts the whole
#: operand set when XLA VMEM-places the custom call's buffers; the grid
#: pipeline itself only needs ~2 x block x 16 buffers. v5e has 128 MiB VMEM.
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel",),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _spec(block, shape_tail, bcast=False):
    if bcast:
        return pl.BlockSpec(shape_tail,
                            lambda i: (_I0,) * len(shape_tail),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((block,) + shape_tail,
                        lambda i: (i,) + (_I0,) * len(shape_tail),
                        memory_space=pltpu.VMEM)


_BDIMS = (((2,), (1,)), ((0,), (0,)))


def _bmm(a, b, mode: str = "highest"):
    """Per-point (b, N, N) @ (b, N, M) on the MXU.

    mode selects the in-kernel precision strategy (SolverConfig.dot_mode):
      * "highest": Mosaic's exact-f32 dot (6 bf16 MXU passes — measured
        identical to precision="float32" in both speed and accuracy);
      * "split3": manual 3-pass bf16 splitting. Mosaic rejects
        precision=HIGH ("Unsupported dot precision"), so XLA's 3-pass mode
        is rebuilt by hand: a = a_hi + a_lo with a_hi = bf16(a) (top 8
        mantissa bits) and a_lo = bf16(a - a_hi) (next 8), then
        a@b ~= ah@bh + ah@bl + al@bh with f32 accumulation; the dropped
        al@bl term is O(2^-16) ~ 1.5e-5 relative — the same error class as
        XLA:TPU's precision=HIGH;
      * "default": single bf16 pass (~4e-3/dot), measurement-only.
    """
    if mode == "split3" and a.dtype == jnp.float32:
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return jax.lax.dot_general(
                x, y, _BDIMS, preferred_element_type=jnp.float32)
        return d(ah, bh) + d(ah, bl) + d(al, bh)
    prec = None if mode == "default" else "highest"
    pe = a.dtype if a.dtype == jnp.float64 else jnp.float32
    return jax.lax.dot_general(
        a, b, _BDIMS, preferred_element_type=pe, precision=prec)


def _eye_like(r):
    n = r.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (rows == cols).astype(r.dtype)[None]


def _ns_inverse(S, ns_iters: int, mode: str = "highest"):
    """(I - S)^-1 by Newton-Schulz from the Neumann seed I + S.

    m <- m (2I - (I - S) m) = m (2I - m + S m); 2 dots per iteration,
    error ||I - m (I-S)|| = rho(S)^(2^(k+1)).
    """
    eye = _eye_like(S)
    m = eye + S
    if mode == "split3" and S.dtype == jnp.float32:
        Ssp = _sp(S)                   # S constant across iterations
        for _ in range(ns_iters):
            msp = _sp(m)
            m = _dot3(msp, _sp(2.0 * eye - m + _dot3(Ssp, msp)))
        return m
    for _ in range(ns_iters):
        m = _bmm(m, 2.0 * eye - m + _bmm(S, m, mode), mode)
    return m


def _norm_sched(ns_sched, ndoubl):
    """Normalize a per-doubling-step NS iteration schedule to a tuple of
    length ndoubl (int -> uniform; None/() -> NS_ITERS everywhere)."""
    if ns_sched is None or ns_sched == ():
        return (NS_ITERS,) * ndoubl
    if isinstance(ns_sched, int):
        return (ns_sched,) * ndoubl
    ns_sched = tuple(int(k) for k in ns_sched)
    assert len(ns_sched) == ndoubl, (ns_sched, ndoubl)
    return ns_sched


def _sp(x):
    """bf16 hi/lo split of an f32 operand (split once, reuse across dots —
    the split casts are VPU work measured at ~25% of the whole solve when
    done per-dot)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _cat_sp(parts, axis=-1):
    """Concat of pre-split operands: bf16(concat(x...)) == concat(bf16(x)...)
    exactly, so split halves concatenate."""
    return (jnp.concatenate([p[0] for p in parts], axis=axis),
            jnp.concatenate([p[1] for p in parts], axis=axis))


def _dot3(asp, bsp):
    """3-pass bf16 product of pre-split operands (see _bmm split3)."""
    ah, al = asp
    bh, bl = bsp

    def d(x, y):
        return jax.lax.dot_general(
            x, y, _BDIMS, preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _doubling_math_split3d(r, t, jp, jm, ek_rows, ns_sched, beer_diag):
    """Beer-diagonal-compensated doubling ladder, all dots at split3.

    Accuracy analysis (round-4 measurement, PERF.md): uniform split3 loses
    4.4e-4 end-to-end because the t-chain (t_new = tt_gp @ t) and j-chain
    (j += tt_gp @ ...) multiply O(1) operators — per-dot 2^-16 errors
    compound linearly over ndoubl x nz steps.  But the O(1) part of t is
    EXACTLY known: the Beer-law diagonal D_k = diag(exp(-dtau 2^k / mu_i)),
    which doubles as D <- D^2.  Carrying t = D + s (s = multiple-scattering
    part, O(omega dtau)) turns every MXU product into small x O(1):

        gp = (I - rr)^-1 = I + g          g = gp - I,   O(rho)
        u  = t gp        = D + v          v = s + D g + s g
        t' = u t         = D^2 + [v D + D s + v s]
        u c              = D c + v c      for every Y-column c

    D-products are exact elementwise row/col scalings (VPU, f32); the
    remaining dots have error ~ 2^-16 |small| — measured end-to-end parity
    2e-5, same as exact-f32 dots, at ~half the MXU passes (PERF.md r4).

    beer_diag: (b, N) row vector of exp(-dtau/mu_i) (= 1 + Em1), the
    analytic diagonal of the ELEMENTAL t_pp's Beer term.
    """
    N = r.shape[-1]
    K = jp.shape[-1]
    eye = _eye_like(r)
    d = beer_diag                                  # (b, N)
    s = t - d[:, :, None] * eye                    # multiple-scattering part
    M = "split3"

    for ns_iters in ns_sched:
        rsp = _sp(r)
        ssp = _sp(s)
        # Inline geometric inverse with split reuse: g = (I-S)^-1 - I.
        # ns_iters == 0 -> g = S exactly (seed-only; scheduled when
        # rho^2 < tol, ops/ns_schedule.iters_for_rho) — zero extra dots
        # and S's split doubles as g's. ns_iters == 1 -> the same
        # degree-3 truncated Neumann polynomial the NS step produces,
        # computed directly (I + S + S^2 + S^3) with one fewer split.
        S = _dot3(rsp, rsp)
        Ssp = _sp(S)
        if ns_iters == 0:
            g, gsp = S, Ssp
        elif ns_iters == 1:
            S2 = _dot3(Ssp, Ssp)
            g = S + S2 + _dot3(Ssp, _sp(S2))
            gsp = _sp(g)
        else:
            m = eye + S
            for _ in range(ns_iters):
                msp = _sp(m)
                m = _dot3(msp, _sp(2.0 * eye - m + _dot3(Ssp, msp)))
            g = m - eye
            gsp = _sp(g)
        v = s + d[:, :, None] * g + _dot3(ssp, gsp)
        jm_e = jm * ek_rows
        X = _dot3(rsp, _cat_sp([ssp, _sp(jp), _sp(jm_e)]))
        rt = r * d[:, None, :] + X[..., :N]        # r @ t  (col-scale + r@s)
        r_jp, r_jme = X[..., N:N + K], X[..., N + K:]
        c3 = jm_e + r_jp
        c4 = jp + r_jme
        W = _dot3(_sp(v), _cat_sp([ssp, _sp(rt), _sp(c3), _sp(c4)]))
        s = (v * d[:, None, :] + d[:, :, None] * s + W[..., :N])
        r = r + d[:, :, None] * rt + W[..., N:2 * N]
        jm = jm + d[:, :, None] * c3 + W[..., 2 * N:2 * N + K]
        jp = jp * ek_rows + d[:, :, None] * c4 + W[..., 2 * N + K:]
        d = d * d
        ek_rows = ek_rows * ek_rows
    t = s + d[:, :, None] * eye
    return r, t, jp, jm


def _doubling_math(r, t, jp, jm, ek_rows, ns_sched, mode: str = "highest",
                   beer_diag=None):
    """The doubling ladder on starred operators — shared by the Pallas
    kernel body and the XLA fallback so both paths are the same algebra.

    ek_rows: (b, N, K) per-ROW beam attenuation (per-spectral-point scalars
    broadcast over their rows; row-wise so block-diagonally packed operands
    carry each point's own expk). Squared every step.

    The thin source-vector products are FOLDED into the matrix products by
    column concatenation: a (N, K) dot pays for a full padded MXU tile
    pass, so r @ [t | jp | jm_e] and tt_gp @ [t | r t | ...] do the same
    work in ~half the tile passes.
    """
    if mode == "split3d" and r.dtype != jnp.float32:
        mode = "highest"        # bf16 splitting is an f32 construction
    if mode == "split3d":
        if beer_diag is None:
            # Callers without the analytic Beer diagonal (per-layer kernel
            # path) get the parity-equivalent exact-t-chain mix instead.
            mode = "mixY"
        else:
            return _doubling_math_split3d(r, t, jp, jm, ek_rows, ns_sched,
                                          beer_diag)
    N = r.shape[-1]
    K = jp.shape[-1]

    # Experimental sub-mode: "mixY" runs the t-chain dots (tt_gp and the
    # wide Y update, whose errors compound multiplicatively through the
    # ladder) at exact f32 and everything else (NS, S = rr, X) at split3.
    m_lo = "split3" if mode == "mixY" else mode
    m_t = "highest" if mode == "mixY" else mode

    # Static unroll: lax.scan does not lower inside Pallas TPU kernels, and
    # ndoubl is small (<= ~12) and static.
    for ns_iters in ns_sched:
        gp = _ns_inverse(_bmm(r, r, m_lo), ns_iters, m_lo)
        tt_gp = _bmm(t, gp, m_t)
        jm_e = jm * ek_rows
        X = _bmm(r, jnp.concatenate([t, jp, jm_e], axis=-1), m_lo)
        rt, r_jp, r_jme = X[..., :N], X[..., N:N + K], X[..., N + K:]
        Y = _bmm(tt_gp, jnp.concatenate(
            [t, rt, jm_e + r_jp, jp + r_jme], axis=-1), m_t)
        t_new = Y[..., :N]
        r = r + Y[..., N:2 * N]
        jm = jm + Y[..., 2 * N:2 * N + K]
        jp = jp * ek_rows + Y[..., 2 * N + K:]
        t = t_new
        ek_rows = ek_rows * ek_rows
    return r, t, jp, jm


def _interaction_math_split3(R_mp, R_pm, T_pp, T_mm, J0_p, J0_m,
                             r_mp, r_pm, t_pp, t_mm, j0_p, j0_m,
                             ns_iters: int):
    """split3 interaction with operand splits deduplicated (r_mp, R_pm,
    inv1, T_pp are each split once and reused — same algebra as
    _interaction_math at mode='split3')."""
    N = R_mp.shape[-1]
    rsp = _sp(r_mp)
    Rpmsp = _sp(R_pm)
    Tppsp = _sp(T_pp)
    tmmsp = _sp(t_mm)
    inv1 = _ns_inverse(_dot3(rsp, Rpmsp), ns_iters, "split3")
    i1sp = _sp(inv1)
    T01_inv = _dot3(_sp(T_mm), i1sp)

    X = _dot3(rsp, _cat_sp([Tppsp, _sp(J0_p)]))
    rT, rJ = X[..., :N], X[..., N:]
    Y1 = _dot3(_sp(T01_inv), _cat_sp([tmmsp, _sp(rT), _sp(rJ + j0_m)]))
    T_mm_new = Y1[..., :N]
    R_mp_new = R_mp + Y1[..., N:2 * N]
    J0_m_new = J0_m + Y1[..., 2 * N:]

    u = _dot3(i1sp, rsp)
    Z = _dot3(Rpmsp, _cat_sp([_sp(u), tmmsp, _sp(j0_m)]))
    Ru, Rt, Rj = Z[..., :N], Z[..., N:2 * N], Z[..., 2 * N:]
    T21_inv = t_pp + _dot3(_sp(t_pp), _sp(Ru))

    Y2 = _dot3(_sp(T21_inv), _cat_sp([Tppsp, _sp(Rt), _sp(J0_p + Rj)]))
    T_pp_new = Y2[..., :N]
    R_pm_new = r_pm + Y2[..., N:2 * N]
    J0_p_new = j0_p + Y2[..., 2 * N:]
    return R_mp_new, R_pm_new, T_pp_new, T_mm_new, J0_p_new, J0_m_new


def _interaction_math(R_mp, R_pm, T_pp, T_mm, J0_p, J0_m,
                      r_mp, r_pm, t_pp, t_mm, j0_p, j0_m, ns_iters: int,
                      mode: str = "highest"):
    """Adding step (Sanghavi 2014 Eqs. 23-28) with a single Newton-Schulz
    inverse: the second geometric factor comes from the push-through
    identity (I - R+- r-+)^-1 = I + R+- (I - r-+ R+-)^-1 r-+."""
    if mode == "split3" and R_mp.dtype == jnp.float32:
        return _interaction_math_split3(
            R_mp, R_pm, T_pp, T_mm, J0_p, J0_m,
            r_mp, r_pm, t_pp, t_mm, j0_p, j0_m, ns_iters)
    N = R_mp.shape[-1]
    K = J0_p.shape[-1]
    inv1 = _ns_inverse(_bmm(r_mp, R_pm, mode), ns_iters, mode)
    T01_inv = _bmm(T_mm, inv1, mode)

    X = _bmm(r_mp, jnp.concatenate([T_pp, J0_p], axis=-1), mode)
    rT, rJ = X[..., :N], X[..., N:]
    Y1 = _bmm(T01_inv, jnp.concatenate([t_mm, rT, rJ + j0_m], axis=-1), mode)
    T_mm_new = Y1[..., :N]
    R_mp_new = R_mp + Y1[..., N:2 * N]
    J0_m_new = J0_m + Y1[..., 2 * N:]

    # T21_inv = t++ (I - R+- r-+)^-1 = t++ + t++ R+- inv1 r-+
    u = _bmm(inv1, r_mp, mode)
    Z = _bmm(R_pm, jnp.concatenate([u, t_mm, j0_m], axis=-1), mode)
    Ru, Rt, Rj = Z[..., :N], Z[..., N:2 * N], Z[..., 2 * N:]
    T21_inv = t_pp + _bmm(t_pp, Ru, mode)

    Y2 = _bmm(T21_inv, jnp.concatenate([T_pp, Rt, J0_p + Rj], axis=-1), mode)
    T_pp_new = Y2[..., :N]
    R_pm_new = r_pm + Y2[..., N:2 * N]
    J0_p_new = j0_p + Y2[..., 2 * N:]

    return R_mp_new, R_pm_new, T_pp_new, T_mm_new, J0_p_new, J0_m_new


def _resolve_interpret(interpret):
    """None -> interpreter mode on non-TPU backends (lets the solver's
    fused path run — and be tested — on CPU with identical semantics)."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _ek_to_rows(ek, N):
    """(s, K) per-point expk -> (s, N, K) per-row; (s, N, K) passes through.

    For block-diagonally packed operands (s' = s/p, N' = pN) the caller
    builds the row-wise form with ops.packing.pack_vec — a free reshape —
    so each packed point's rows carry its own attenuation factor.
    """
    if ek.ndim == 3:
        return ek
    return jnp.broadcast_to(ek[:, None, :], (ek.shape[0], N, ek.shape[1]))


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _doubling_kernel(r_ref, t_ref, jp_ref, jm_ref, ek_ref,
                     ro_ref, to_ref, jpo_ref, jmo_ref, *, ns_sched,
                     dot_mode):
    r, t, jp, jm = _doubling_math(
        r_ref[:], t_ref[:], jp_ref[:], jm_ref[:], ek_ref[:], ns_sched,
        dot_mode)
    ro_ref[:] = r
    to_ref[:] = t
    jpo_ref[:] = jp
    jmo_ref[:] = jm


def fused_doubling(r, t, jp, jm, expk, ndoubl: int,
                   ns_sched=None, block: int = DEFAULT_BLOCK,
                   interpret: bool | None = None,
                   dot_mode: str = "highest"):
    """VMEM-resident doubling ladder on starred operators.

    r, t: (s, N, N); jp, jm: (s, N, K); expk: (s, K) per-point or (s, N, K)
    per-row. Returns (r, t, jp, jm) after ``ndoubl`` doublings (expk
    handling included).
    """
    s, N, _ = r.shape
    K = jp.shape[-1]
    block = min(block, s)
    assert s % block == 0, (s, block)
    grid = (s // block,)
    ns_sched = _norm_sched(ns_sched, ndoubl)
    ek_rows = _ek_to_rows(expk, N)
    interpret = _resolve_interpret(interpret)

    mat, vec = _spec(block, (N, N)), _spec(block, (N, K))
    out_shapes = (
        jax.ShapeDtypeStruct(r.shape, r.dtype),
        jax.ShapeDtypeStruct(t.shape, t.dtype),
        jax.ShapeDtypeStruct(jp.shape, jp.dtype),
        jax.ShapeDtypeStruct(jm.shape, jm.dtype),
    )
    fn = pl.pallas_call(
        partial(_doubling_kernel, ns_sched=ns_sched, dot_mode=dot_mode),
        grid=grid,
        in_specs=[mat, mat, vec, vec, vec],
        out_specs=(mat, mat, vec, vec),
        out_shape=out_shapes,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )
    return fn(r, t, jp, jm, ek_rows)


def _layer_kernel(Rmp_ref, Rpm_ref, Tpp_ref, Tmm_ref, Jp_ref, Jm_ref,
                  r_ref, t_ref, jp_ref, jm_ref, ek_ref, dsgn_ref,
                  Rmp_o, Rpm_o, Tpp_o, Tmm_o, Jp_o, Jm_o,
                  *, ns_sched, ns_inter: int, dot_mode: str):
    """Whole layer step: doubling ladder then interaction, one HBM trip.

    Inputs arrive STARRED (r* = D r-+, j-* = D j0-, elemental.jl:416-419);
    the D-matrix unstarring and the parity reconstruction of the reverse
    operators r+- = D r-+ D, t-- = D t++ D happen in-kernel via the sign
    masks (dsgn_ref rows: d_vec and the outer-product signs).
    """
    d_vec = dsgn_ref[0]                     # (N,) +-1
    r, t, jp, jm = _doubling_math(
        r_ref[:], t_ref[:], jp_ref[:], jm_ref[:], ek_ref[:], ns_sched,
        dot_mode)
    # Unstar + parity reconstruction (doubling.jl:178-216).
    sgn = d_vec[:, None] * d_vec[None, :]   # (N, N)
    r_mp = r * d_vec[None, :, None]
    jm_u = jm * d_vec[None, :, None]
    r_pm = sgn[None] * r_mp
    t_mm = sgn[None] * t

    out = _interaction_math(
        Rmp_ref[:], Rpm_ref[:], Tpp_ref[:], Tmm_ref[:], Jp_ref[:], Jm_ref[:],
        r_mp, r_pm, t, t_mm, jp, jm_u, ns_inter, dot_mode)
    for ref, val in zip((Rmp_o, Rpm_o, Tpp_o, Tmm_o, Jp_o, Jm_o), out):
        ref[:] = val


def fused_layer_step(comp, r_star, t_pp, jp, jm_star, expk, d_vec,
                     ndoubl: int, ns_sched=None, ns_inter: int = NS_ITERS,
                     block: int = DEFAULT_BLOCK,
                     interpret: bool | None = None,
                     dot_mode: str = "highest"):
    """Fused doubling + interaction for one layer.

    comp: tuple (R_mp, R_pm, T_pp, T_mm, J0_p, J0_m) with matrices
    (s, N, N) and sources (s, N, K). r_star/jm_star are the starred
    elemental operators; expk is (s, K) per-point or (s, N, K) per-row
    (packed operands). Returns the new composite tuple.
    """
    R_mp, R_pm, T_pp, T_mm, J0_p, J0_m = comp
    s, N, _ = r_star.shape
    K = jp.shape[-1]
    block = min(block, s)
    assert s % block == 0, (s, block)
    ns_sched = _norm_sched(ns_sched, ndoubl)
    ek_rows = _ek_to_rows(expk, N)
    interpret = _resolve_interpret(interpret)

    mat, vec = _spec(block, (N, N)), _spec(block, (N, K))
    dsgn = jnp.broadcast_to(d_vec.astype(r_star.dtype)[None, :], (8, N))

    out_shapes = tuple(
        jax.ShapeDtypeStruct(a.shape, a.dtype)
        for a in (R_mp, R_pm, T_pp, T_mm, J0_p, J0_m))
    fn = pl.pallas_call(
        partial(_layer_kernel, ns_sched=ns_sched, ns_inter=ns_inter,
                dot_mode=dot_mode),
        grid=(s // block,),
        in_specs=[mat, mat, mat, mat, vec, vec,
                  mat, mat, vec, vec, vec, _spec(block, (8, N), bcast=True)],
        out_specs=(mat, mat, mat, mat, vec, vec),
        out_shape=out_shapes,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )
    return fn(R_mp, R_pm, T_pp, T_mm, J0_p, J0_m,
              r_star, t_pp, jp, jm_star, ek_rows, dsgn)


def pick_block(s: int, N: int, max_block: int = DEFAULT_BLOCK) -> int:
    """Largest power-of-two block <= max_block that divides the (possibly
    packed) spectral extent s, scaled down for wide packed operators so the
    working set stays within VMEM."""
    if N > 96:
        max_block = max(max_block // 2, 1)
    b = 1
    while b * 2 <= max_block and s % (b * 2) == 0:
        b *= 2
    return b


def use_fused() -> bool:
    """Whether the Pallas fused layer path applies on this backend."""
    import os
    if os.environ.get("VSM_NO_FUSED"):
        return False
    return jax.default_backend() == "tpu"
