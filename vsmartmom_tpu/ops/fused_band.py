"""Whole-moment fused Pallas kernel: elemental -> pack -> ladder -> adding
for ALL layers of one Fourier moment in a single VMEM-resident kernel.

Round-3 profiler finding: with the per-layer fused kernel
(ops/fused_rt.py), the kernel itself is only ~40% of the solve — the XLA
elemental assembly (big (s, N, N) elementwise fusions), the block-diagonal
packing scatters, and the layer-scan carry copies cost more than the MXU
work they feed. This kernel moves the entire per-moment pipeline inside
Pallas:

* grid = (spectral blocks, nz) with ``("parallel", "arbitrary")``
  dimension semantics: the composite operators live in VMEM scratch across
  the layer dimension (the canonical Pallas accumulator pattern), so HBM
  sees per-layer SCALARS (tau, weights, precursors) in and one composite
  out per moment — the (s, N, N) elemental operators never exist in HBM;
* the mixed phase matrix sum_c w_c Z_c / tau, the cancellation-free
  elemental assembly (Fell 1997 finite-dtau operators, behavioral
  reference CoreKernel/elemental.jl:63-392), the solar/thermal source
  vectors, the D-matrix starring, and the block-diagonal packing
  (ops/packing.py) all happen on the VPU in VMEM;
* f64-sensitive transcendentals (expm1(-dtau/mu) precursors, beam
  attenuation — see core/kernels._exp) stay OUTSIDE in XLA on small
  (nz, s, N) arrays; the kernel consumes them as inputs, so the numerics
  match core/kernels.elemental exactly;
* per-moment scalars (fourier_w, is_m0) are folded into the INPUTS
  (F0_m = fourier_w * F0, thermal zeroed for m > 0, weight row
  wct = fourier_w * wt), so one kernel compilation serves every moment.

The doubling ladder and interaction reuse _doubling_math /
_interaction_math from ops/fused_rt.py — same algebra as the XLA path.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_rt import _doubling_math, _interaction_math, _norm_sched

_I0 = np.int32(0)


def _expm1_s(x):
    """expm1 for Mosaic (no expm1 primitive): 6-term Horner series for
    |x| < 0.3 (rel err < 1e-7, below f32 eps), exp(x) - 1 elsewhere
    (rel err ~ eps/|expm1| < 4e-7 there)."""
    series = x * (1.0 + x * (0.5 + x * (1.0 / 6.0 + x * (
        1.0 / 24.0 + x * (1.0 / 120.0 + x * (1.0 / 720.0))))))
    return jnp.where(jnp.abs(x) < 0.3, series, jnp.exp(x) - 1.0)


def _bspec(block_shape, index_map):
    return pl.BlockSpec(block_shape, index_map, memory_space=pltpu.VMEM)


def _moment_kernel(Zpp_ref, Zmp_ref, tau_ref, w_ref, Em1_ref, Em10_ref,
                   att_ref, ek_ref, th_ref, F0_ref, aux_ref,
                   Rmp_o, Rpm_o, Tpp_o, Tmm_o, Jp_o, Jm_o,
                   Rmp_s, Rpm_s, Tpp_s, Tmm_s, Jp_s, Jm_s,
                   *, nz, ns_sched, ns_inter, pack, n_stokes, i_mu0_start,
                   n_sources):
    """One (spectral-block, layer) grid step.

    Refs (b = raw spectral block, C = components, N = raw supermatrix dim):
      Zpp/Zmp  (C, N, N)   per-moment phase supermatrices (bcast)
      tau      (1, b)      layer total optical depth
      w        (C, b)      layer scattering weights tau_c * pi_c
      Em1      (1, b, N)   expm1(-dtau/mu) precursor (f64-accurate, f32)
      Em10     (1, b)      expm1(-dtau/mu0)
      att      (1, b)      exp(-tau_sum_above/mu0) beam attenuation
      ek       (1, b)      exp(-dtau/mu0) solar doubling factor
      th       (1, b)      2pi (1-ssa) B thermal magnitude (0 unless m=0
                           and thermal active; includes the is_m0 mask)
      F0       (ns, b)     fourier_w-scaled solar Stokes vector
      aux      (8, N)      rows: 0 qp_mu_N, 1 wct = fourier_w*wt_mu_N,
                           2 d_vec, 3 is_I mask, 4 in_solar_block mask
    Scratch (packed dims bp = b/pack, Np = pack*N):
      *_s      (bp, Np, Np) / (bp, Np, K) composite accumulators
    """
    z = pl.program_id(1)
    N = Zpp_ref.shape[-1]
    b = tau_ref.shape[-1]           # scalar refs are (1, 1, b)
    bp = b // pack
    Np = pack * N
    K = n_sources
    dtype = Zpp_ref.dtype

    qp = aux_ref[0]
    wct = aux_ref[1]
    d_vec = aux_ref[2]
    is_I = aux_ref[3]
    in_blk = aux_ref[4]

    # ---- composite init at the first layer: vacuum (R=0, T=I, J=0) ----
    @pl.when(z == 0)
    def _init():
        rows = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
        eye = (rows == cols).astype(dtype)[None]
        zero = jnp.zeros((bp, Np, Np), dtype)
        Rmp_s[:] = zero
        Rpm_s[:] = zero
        Tpp_s[:] = eye + zero
        Tmm_s[:] = eye + zero
        Jp_s[:] = jnp.zeros((bp, Np, K), dtype)
        Jm_s[:] = jnp.zeros((bp, Np, K), dtype)

    # ---- elemental assembly (core/kernels.elemental, in VMEM) ----
    tau = tau_ref[0, 0]                      # (b,)
    w = w_ref[0]                             # (C, b)
    Em1 = Em1_ref[0]                         # (b, N)
    E = 1.0 + Em1
    Em1_0 = Em10_ref[0, 0]                   # (b,)
    att = att_ref[0, 0]
    ndoubl = len(ns_sched)
    safe_tau = jnp.where(tau > 0, tau, 1.0)
    dtau = tau / (2.0 ** ndoubl)

    # wZ = sum_c w_c Z_c / tau  -> (b, N, N)
    wZ_pp = jnp.zeros((b, N, N), dtype)
    wZ_mp = jnp.zeros((b, N, N), dtype)
    for c in range(w.shape[0]):
        wc = (w[c] / safe_tau)[:, None, None]
        wZ_pp = wZ_pp + wc * Zpp_ref[c][None]
        wZ_mp = wZ_mp + wc * Zmp_ref[c][None]

    mu_i = qp[:, None]
    mu_j = qp[None, :]
    r_geom = (mu_j / (mu_i + mu_j)) * wct[None, :]
    one_m_EE = -(Em1[:, :, None] + Em1[:, None, :]
                 + Em1[:, :, None] * Em1[:, None, :])
    r_mp = wZ_mp * r_geom[None] * one_m_EE

    same_mu = (jnp.abs(mu_i - mu_j)
               <= 1e-9 * jnp.maximum(mu_i, mu_j))
    delta = jnp.where(same_mu, 1.0, mu_i - mu_j)
    d3 = dtau[:, None, None]
    ratio = _expm1_s(d3 * (delta / (mu_i * mu_j))[None]) / delta[None]
    t_off = wZ_pp * (mu_j * wct[None, :])[None] * E[:, None, :] * ratio
    t_same = E[:, None, :] * wZ_pp * (d3 / mu_i[None]) * wct[None, None, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    beer = E[:, :, None] * (rows == cols).astype(dtype)[None]
    t_pp = jnp.where(same_mu[None], t_same + beer, t_off)

    # Solar sources (fourier_w folded into F0_ref).
    sl0 = i_mu0_start
    F0 = F0_ref[:]                           # (ns, b)
    Zp_blk = Zpp_ref[:, :, sl0:sl0 + n_stokes]   # (C, N, ns)
    Zm_blk = Zmp_ref[:, :, sl0:sl0 + n_stokes]
    Zp_I0 = jnp.zeros((b, N), dtype)
    Zm_I0 = jnp.zeros((b, N), dtype)
    for c in range(w.shape[0]):
        wc = (w[c] / safe_tau)[:, None]
        for k in range(n_stokes):
            Zp_I0 = Zp_I0 + wc * F0[k][:, None] * Zp_blk[c, :, k][None]
            Zm_I0 = Zm_I0 + wc * F0[k][:, None] * Zm_blk[c, :, k][None]

    mu0 = qp[sl0]
    dt = dtau[:, None]
    E_0 = (1.0 + Em1_0)[:, None]
    jp_in = Zp_I0 * (dt / qp[None, :]) * E
    delta_s = jnp.where(in_blk > 0.5, 1.0, qp - mu0)[None, :]
    jp_out = Zp_I0 * (mu0 / delta_s) * E_0 * \
        _expm1_s(dt * delta_s / (qp[None, :] * mu0))
    j_sol_p = jnp.where(in_blk[None, :] > 0.5, jp_in, jp_out)
    one_m_EE0 = -(Em1 + Em1_0[:, None] + Em1 * Em1_0[:, None])
    j_sol_m = Zm_I0 * (mu0 / (qp[None, :] + mu0)) * one_m_EE0
    j_sol_p = j_sol_p * att[:, None]
    j_sol_m = j_sol_m * att[:, None]

    ek_sol = ek_ref[0, 0]                    # (b,)
    if K == 1:
        j0_p = j_sol_p[..., None]
        j0_m = j_sol_m[..., None]
        ek_rows = jnp.broadcast_to((ek_sol[:, None])[..., None], (b, N, K))
    else:
        th = th_ref[0, 0]                    # (b,) premasked magnitude
        j_th = th[:, None] * (-Em1) * is_I[None, :]
        j0_p = jnp.stack([j_sol_p, j_th], axis=-1)
        j0_m = jnp.stack([j_sol_m, j_th], axis=-1)
        ek_rows = jnp.stack(
            [jnp.broadcast_to(ek_sol[:, None], (b, N)),
             jnp.ones((b, N), dtype)], axis=-1)

    # ---- star + block-diagonal pack (ops/packing.py conventions) ----
    r_star = r_mp * d_vec[None, :, None]
    jm_star = j0_m * d_vec[None, :, None]

    if pack > 1:
        # Block-diagonal assembly by concatenation (Mosaic has no scatter):
        # row-block q = [0 .. 0 | X_q | 0 .. 0], stacked along rows.
        def blockdiag(x):
            x4 = x.reshape(bp, pack, N, N)
            zero = jnp.zeros((bp, N, N), dtype)
            rows = []
            for q in range(pack):
                cols = [zero] * pack
                cols[q] = x4[:, q]
                rows.append(jnp.concatenate(cols, axis=2))
            return jnp.concatenate(rows, axis=1)

        rp = blockdiag(r_star)
        tp = blockdiag(t_pp)
        jpp = j0_p.reshape(bp, Np, K)
        jmp = jm_star.reshape(bp, Np, K)
        ekp = ek_rows.reshape(bp, Np, K)
        d_p = jnp.concatenate([d_vec] * pack)
    else:
        rp, tp, jpp, jmp, ekp, d_p = (r_star, t_pp, j0_p, jm_star,
                                      ek_rows, d_vec)

    # ---- doubling ladder + interaction (shared algebra) ----
    r, t, jp_v, jm_v = _doubling_math(rp, tp, jpp, jmp, ekp, ns_sched)
    sgn = d_p[:, None] * d_p[None, :]
    r_mp_l = r * d_p[None, :, None]
    jm_u = jm_v * d_p[None, :, None]
    r_pm_l = sgn[None] * r_mp_l
    t_mm_l = sgn[None] * t

    out = _interaction_math(
        Rmp_s[:], Rpm_s[:], Tpp_s[:], Tmm_s[:], Jp_s[:], Jm_s[:],
        r_mp_l, r_pm_l, t, t_mm_l, jp_v, jm_u, ns_inter)
    for ref, val in zip((Rmp_s, Rpm_s, Tpp_s, Tmm_s, Jp_s, Jm_s), out):
        ref[:] = val

    # ---- emit at the last layer ----
    @pl.when(z == nz - 1)
    def _emit():
        Rmp_o[:] = Rmp_s[:]
        Rpm_o[:] = Rpm_s[:]
        Tpp_o[:] = Tpp_s[:]
        Tmm_o[:] = Tmm_s[:]
        Jp_o[:] = Jp_s[:]
        Jm_o[:] = Jm_s[:]


def fused_moment(Z_pp_m, Z_mp_m, tau, scat_w, Em1, Em1_0, att, ek_sol,
                 thermal, F0_m, qp_mu_N, wct, d_vec, is_I, in_blk,
                 *, ndoubl, ns_sched=None, ns_inter=6, pack=1,
                 n_stokes, i_mu0_start, n_sources=1, block=16,
                 interpret=None):
    """Run all nz layers of one Fourier moment in one Pallas kernel.

    Shapes: Z (C, N, N); tau/Em1_0/att/ek_sol/thermal (nz, s);
    scat_w (nz, C, s); Em1 (nz, s, N); F0_m (ns, s); aux vectors (N,).
    Returns the packed composite tuple (R_mp, R_pm, T_pp, T_mm, J0_p, J0_m)
    with shapes (s/pack, pack*N, pack*N) / (s/pack, pack*N, K).
    """
    nz, s = tau.shape
    C, N, _ = Z_pp_m.shape
    K = n_sources
    assert s % pack == 0, (s, pack)
    # Mosaic block rule: trailing block dim must be 128-divisible or the
    # full array extent — so b = s for narrow batches, else 128 (callers
    # guard s % 128 == 0; see solver use_band condition).
    b = s if s <= 128 else 128
    assert s % b == 0 and b % pack == 0, (s, b, pack)
    bp = b // pack
    Np = pack * N
    grid = (s // b, nz)
    ns_sched = _norm_sched(ns_sched, ndoubl)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    aux = jnp.stack([qp_mu_N, wct, d_vec, is_I, in_blk,
                     jnp.zeros_like(qp_mu_N), jnp.zeros_like(qp_mu_N),
                     jnp.zeros_like(qp_mu_N)]).astype(Z_pp_m.dtype)

    # Scalar per-layer inputs as (nz, 1, s): the middle singleton makes the
    # (1, 1, b) block legal (dim -2 equals the full extent 1).
    tau3 = tau[:, None, :]
    Em10_3 = Em1_0[:, None, :]
    att3 = att[:, None, :]
    ek3 = ek_sol[:, None, :]
    th3 = thermal[:, None, :]

    in_specs = [
        _bspec((C, N, N), lambda i, z: (_I0, _I0, _I0)),     # Zpp
        _bspec((C, N, N), lambda i, z: (_I0, _I0, _I0)),     # Zmp
        _bspec((1, 1, b), lambda i, z: (z, _I0, i)),         # tau
        _bspec((1, C, b), lambda i, z: (z, _I0, i)),         # scat_w
        _bspec((1, b, N), lambda i, z: (z, i, _I0)),         # Em1
        _bspec((1, 1, b), lambda i, z: (z, _I0, i)),         # Em1_0
        _bspec((1, 1, b), lambda i, z: (z, _I0, i)),         # att
        _bspec((1, 1, b), lambda i, z: (z, _I0, i)),         # ek
        _bspec((1, 1, b), lambda i, z: (z, _I0, i)),         # thermal
        _bspec((F0_m.shape[0], b), lambda i, z: (_I0, i)),   # F0
        _bspec((8, N), lambda i, z: (_I0, _I0)),             # aux
    ]
    mat_o = _bspec((bp, Np, Np), lambda i, z: (i, _I0, _I0))
    vec_o = _bspec((bp, Np, K), lambda i, z: (i, _I0, _I0))
    out_shapes = (
        jax.ShapeDtypeStruct((s // pack, Np, Np), Z_pp_m.dtype),
    ) * 4 + (
        jax.ShapeDtypeStruct((s // pack, Np, K), Z_pp_m.dtype),
    ) * 2
    scratch = [pltpu.VMEM((bp, Np, Np), Z_pp_m.dtype)] * 4 + \
              [pltpu.VMEM((bp, Np, K), Z_pp_m.dtype)] * 2

    kernel = partial(_moment_kernel, nz=nz, ns_sched=ns_sched,
                     ns_inter=ns_inter, pack=pack, n_stokes=n_stokes,
                     i_mu0_start=i_mu0_start, n_sources=n_sources)
    fn = pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs,
        out_specs=(mat_o,) * 4 + (vec_o,) * 2,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return fn(Z_pp_m, Z_mp_m, tau3, scat_w, Em1, Em10_3, att3, ek3,
              th3, F0_m, aux)
