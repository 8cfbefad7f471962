"""Exact linearized Mie: analytic tangents of the NAI-2 -> delta-BGE -> delta-M
pipeline w.r.t. the aerosol microphysics (n_r, n_i, mu_log, sigma_log).

The reference differentiates its Mie code with ForwardDiff dual numbers
(/root/reference/src/Scattering/compute_NAI2_lin.jl:1-645,
lin_model_from_parameters.jl:21-52).  The TPU-native equivalent traces the
same pipeline with JAX (f64 on host — Mie is setup-time, not hot-loop;
SURVEY §7 precision policy) and takes exact forward-mode derivatives with
``jax.jacfwd``.  This replaces the round-1 central-FD tangents whose
truncation error was unquantified against the rtol 1e-5 Jacobian parity
gate (VERDICT round-1 item 7).

Discretization convention: series lengths (n_max, nmx), validity masks and
the angular grid are frozen at their primal values; the radius quadrature
NODES are traced through (mu_log, sigma_log) exactly as ForwardDiff sees
them in the reference (r_min = lognormal quantile -> the whole log-spaced
grid moves with the distribution), so the tangents match finite
differences of the discretized pipeline to machine precision even at
coarse nquad_radius.
"""

from dataclasses import replace as dc_replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .greek import GreekCoefs
from .legendre import compute_legendre_poly, compute_mie_pi_tau
from .mie import Aerosol, AerosolOptics, SizeDistribution, gauleg_log, get_n_max

_SQRT2PI = np.sqrt(2.0 * np.pi)


def _lognorm_pdf(r, mu_log, sigma_log):
    ln = jnp.log(r)
    return jnp.exp(-((ln - mu_log) ** 2) / (2.0 * sigma_log ** 2)) / (
        r * sigma_log * _SQRT2PI)


def _mie_ab_jax(x, m_ref, n_max: int, nmx: int, valid_mask):
    """JAX trace of mie.compute_mie_ab (de Rooij & Stap downward D_n,
    upward Riccati-Bessel). x: static (nr,) f64; m_ref: traced complex
    scalar; valid_mask: static (n_max, nr) bool (n <= n_max(x_i))."""
    x = jnp.asarray(x)
    y = x * m_ref

    def dn_step(D_prev, n):
        ratio = (n + 1.0) / y
        D = ratio - 1.0 / (D_prev + ratio)
        return D, D

    ns_down = jnp.arange(nmx - 1, 0, -1, dtype=jnp.float64)
    _, Dn_stack = jax.lax.scan(dn_step, jnp.zeros_like(y), ns_down)
    # Dn_stack[k] = D_{nmx-1-k}; we need D_n for n = 1..n_max:
    Dn = Dn_stack[nmx - 1 - np.arange(1, n_max + 1)]       # (n_max, nr)

    psi0, psi1 = jnp.cos(x), jnp.sin(x)
    chi0, chi1 = -jnp.sin(x), jnp.cos(x)

    def ab_step(carry, inp):
        psi0, psi1, chi0, chi1 = carry
        n, Dn_n, valid = inp
        psi = (2.0 * n - 1.0) * psi1 / x - psi0
        chi = (2.0 * n - 1.0) * chi1 / x - chi0
        # Mask the exponentially growing invalid lanes to 1 BEFORE any use
        # so no inf/nan can leak into tangents through jnp.where.
        psi_s = jnp.where(valid, psi, 1.0)
        chi_s = jnp.where(valid, chi, 0.0)
        psi1_s = jnp.where(valid, psi1, 1.0)
        chi1_s = jnp.where(valid, chi1, 0.0)
        xi = psi_s + 1j * chi_s
        xi1 = psi1_s + 1j * chi1_s
        t_a = Dn_n / m_ref + n / x
        t_b = Dn_n * m_ref + n / x
        an = jnp.where(valid, (t_a * psi_s - psi1_s) / (t_a * xi - xi1), 0.0)
        bn = jnp.where(valid, (t_b * psi_s - psi1_s) / (t_b * xi - xi1), 0.0)
        # keep the carried recursion bounded on invalid lanes
        carry = (psi1, jnp.where(valid, psi, 1.0),
                 chi1, jnp.where(valid, chi, 1.0))
        return carry, (an, bn)

    ns = jnp.arange(1, n_max + 1, dtype=jnp.float64)
    _, (an, bn) = jax.lax.scan(
        ab_step, (psi0, psi1, chi0, chi1),
        (ns, Dn, jnp.asarray(valid_mask)))
    return an.T, bn.T                                      # (nr, n_max)


def _traced_radius_grid(mu_log, sigma_log, *, xi, w_leg, ln_hi, z8,
                        ln_lo_const):
    """Radius quadrature as a traced function of the distribution params.

    Mirrors mie.gauleg_log + the r_min = max(quantile(1e-8), 1e-6 r_max)
    rule: ln r_min = mu + sigma * z8 (lognormal ppf), with z8 = 0 when
    the primal point takes the constant 1e-6 r_max branch.  ForwardDiff in
    the reference differentiates the same grid dependence
    (compute_NAI2_lin.jl) — at finite nquad_radius the quadrature-grid
    motion is part of the derivative of the discretized integral.
    """
    if z8 is None:         # constant 1e-6 r_max branch: grid is fixed
        ln_lo = jnp.asarray(ln_lo_const)
    else:
        ln_lo = mu_log + sigma_log * z8
    r = jnp.exp(0.5 * (ln_hi - ln_lo) * xi + 0.5 * (ln_hi + ln_lo))
    wr = w_leg * r * (ln_hi - ln_lo) / 2.0
    return r, wr


def _bulk_extinction_jax(theta, *, grid_static, k_wav, n_max, nmx,
                         valid_mask, fixed_m: Optional[complex]):
    """Traced bulk C_ext at a wavelength (mie.compute_ref_aerosol_extinction)."""
    n_r, n_i, mu_log, sigma_log = theta
    m_ref = (fixed_m if fixed_m is not None else n_r - 1j * n_i)
    r, wr = _traced_radius_grid(mu_log, sigma_log, **grid_static)
    x = k_wav * r
    an, bn = _mie_ab_jax(x, m_ref + 0j, n_max, nmx, valid_mask)
    two_n1 = 2.0 * jnp.arange(1, n_max + 1) + 1.0
    C_ext = 2 * jnp.pi / k_wav ** 2 * (jnp.real(an + bn) @ two_n1)
    wx = _lognorm_pdf(r, mu_log, sigma_log) * wr
    wx = wx / jnp.sum(wx)
    return jnp.sum(wx * C_ext)


def _nai2_jax(theta, *, grid_static, k_wav, n_max, nmx, valid_mask,
              leg_pi, leg_tau, mu, w_mu, P, P2, R2, T2, fac, half):
    """Traced NAI-2 bulk optics (mie.compute_aerosol_optical_properties)."""
    n_r, n_i, mu_log, sigma_log = theta
    m_ref = n_r - 1j * n_i
    r, wr = _traced_radius_grid(mu_log, sigma_log, **grid_static)
    x = k_wav * r
    an, bn = _mie_ab_jax(x, m_ref, n_max, nmx, valid_mask)

    ns = jnp.arange(1, n_max + 1, dtype=jnp.float64)
    two_n1 = 2.0 * ns + 1.0
    C_sca = 2 * jnp.pi / k_wav ** 2 * (
        (jnp.abs(an) ** 2 + jnp.abs(bn) ** 2) @ two_n1)
    C_ext = 2 * jnp.pi / k_wav ** 2 * (jnp.real(an + bn) @ two_n1)

    cn = two_n1 / (ns * (ns + 1.0))
    S1 = (leg_tau * cn) @ an.T + (leg_pi * cn) @ bn.T      # (n_mu, nr)
    S2 = (leg_pi * cn) @ an.T + (leg_tau * cn) @ bn.T

    inv_x2 = 0.5 / x ** 2
    f11 = inv_x2 * (jnp.abs(S1) ** 2 + jnp.abs(S2) ** 2)
    f33 = inv_x2 * (2.0 * jnp.real(S1 * jnp.conj(S2)))
    f12 = -inv_x2 * (jnp.abs(S1) ** 2 - jnp.abs(S2) ** 2)
    f34 = -inv_x2 * jnp.imag(S1 * jnp.conj(S2) - S2 * jnp.conj(S1))

    wx = _lognorm_pdf(r, mu_log, sigma_log) * wr
    wx = wx / jnp.sum(wx)
    bulk_C_sca = jnp.sum(wx * C_sca)
    bulk_C_ext = jnp.sum(wx * C_ext)
    wr_phase = 4 * jnp.pi * r ** 2 * wx
    bf11 = f11 @ wr_phase / bulk_C_sca
    bf33 = f33 @ wr_phase / bulk_C_sca
    bf12 = f12 @ wr_phase / bulk_C_sca
    bf34 = f34 @ wr_phase / bulk_C_sca

    # Greek projection (mie.greek_from_scattering_matrix)
    wf = w_mu
    beta = half * ((wf * bf11) @ P)
    delta = half * ((wf * bf33) @ P)
    gamma = fac * ((wf * bf12) @ P2)
    eps = fac * ((wf * bf34) @ P2)
    zeta = fac * ((wf * bf33) @ R2 + (wf * bf11) @ T2)
    alpha = fac * ((wf * bf11) @ R2 + (wf * bf33) @ T2)
    return (alpha, beta, gamma, delta, eps, zeta), bulk_C_sca / bulk_C_ext, \
        bulk_C_ext


def _delta_bge_jax(greek6, l_max: int, *, mu_t, w_t, Pt, P2t, R2t, T2t,
                   fac_full, fac_t):
    """Traced delta-BGE truncation (mie.truncate_phase_delta_bge)."""
    alpha, beta, gamma, delta, eps, zeta = greek6
    # reconstruct_phase on the truncation angle grid
    f11 = Pt @ beta
    f12 = P2t @ (fac_full * gamma)
    f34 = P2t @ (fac_full * eps)

    def fit(B, y):
        wy2 = w_t / y ** 2
        A = (B * wy2[:, None]).T @ B
        b = B.T @ (w_t / y)
        return jnp.linalg.solve(A, b)

    cl = fit(Pt[:, :l_max], f11)
    B2 = P2t[:, 2:l_max] * fac_t[None, 2:]
    gcoef = fit(B2, f12)
    ecoef = fit(B2, f34)

    c0 = cl[0]
    beta_t = cl / c0
    corr = beta[:l_max] - cl
    delta_t = (delta[:l_max] - corr) / c0
    alpha_t = (alpha[:l_max] - corr) / c0
    zeta_t = (zeta[:l_max] - corr) / c0
    gamma_t = jnp.concatenate([jnp.zeros(2), gcoef])
    eps_t = jnp.concatenate([jnp.zeros(2), ecoef])
    return (alpha_t, beta_t, gamma_t, delta_t, eps_t, zeta_t), 1.0 - c0


def build_lin_aerosol_fn(aer, scat, lam_band: float, profile_shape,
                         use_bge: bool, l_cap: int):
    """Return a traced function theta -> component outputs plus the primal
    theta, replicating model._build_one_aerosol for a Mie aerosol.

    Outputs (pytree): dict with greek (6, L), ssa (delta-M scaled),
    tau_profile (Nz,), k_over_kref. Differentiate with jax.jacfwd.
    """
    theta0 = np.array([aer.n_r, aer.n_i, aer.mu_log, aer.sigma_log])

    # --- discretization: sizes/masks frozen at the primal point, node
    # positions traced through (mu_log, sigma_log) ---
    dist = SizeDistribution(aer.mu_log, aer.sigma_log)
    q8 = dist.quantile(1e-8)
    lo_const = 1e-6 * scat.r_max
    r_min = max(q8, lo_const)
    r, wr = gauleg_log(scat.nquad_radius, r_min, scat.r_max)
    xi_leg, w_leg = np.polynomial.legendre.leggauss(scat.nquad_radius)
    from scipy.special import erfinv
    z8 = float(np.sqrt(2.0) * erfinv(2 * 1e-8 - 1.0)) if q8 >= lo_const \
        else None   # None: constant branch, grid insensitive to (mu, sigma)
    grid_static = dict(xi=xi_leg, w_leg=w_leg, ln_hi=np.log(scat.r_max),
                       z8=z8, ln_lo_const=np.log(r_min))

    # nmx for the Dn recursion must cover |y| = |x m|: freeze with the
    # primal refractive index, padded (same bound as mie.compute_mie_ab).
    m0 = abs(complex(aer.n_r, -aer.n_i))

    def static_geom(lam):
        k_wav = 2 * np.pi / lam
        x = k_wav * r
        n_max = get_n_max(np.max(x))
        n_max_i = np.array([get_n_max(xi) for xi in x])
        valid = (np.arange(1, n_max + 1)[:, None] <= n_max_i[None, :])
        nmx = int(max(n_max, np.max(x) * max(m0, 1.0)) + 51)
        return dict(grid_static=grid_static, k_wav=k_wav, n_max=n_max,
                    nmx=nmx, valid_mask=valid)

    g_band = static_geom(lam_band)
    n_mu = 2 * g_band["n_max"] - 1
    mu, w_mu = np.polynomial.legendre.leggauss(n_mu)
    leg_pi, leg_tau = compute_mie_pi_tau(mu, g_band["n_max"])
    P, P2, R2, T2 = compute_legendre_poly(mu, n_mu)
    ls = np.arange(n_mu)
    half = (2 * ls + 1) / 2.0
    with np.errstate(divide="ignore"):
        fac = np.where(ls >= 2, half / np.sqrt(np.maximum(
            1.0, (ls - 1.0) * ls * (ls + 1.0) * (ls + 2.0))), 0.0)
    g_band.update(leg_pi=leg_pi, leg_tau=leg_tau, mu=mu, w_mu=w_mu,
                  P=P, P2=P2, R2=R2, T2=T2, fac=fac, half=half)

    # reference-wavelength extinction geometry
    n_ref = scat.n_ref if scat.n_ref is not None else \
        complex(aer.n_r, -aer.n_i)
    fixed_m = complex(n_ref) if scat.n_ref is not None else None
    g_ref = static_geom(scat.lambda_ref)

    truncate = use_bge and n_mu > l_cap
    l_max_t = l_cap
    if truncate:
        mu_t, w_t = np.polynomial.legendre.leggauss(n_mu)
        Pt, P2t, R2t, T2t = compute_legendre_poly(mu_t, n_mu)
        ls_full = np.arange(n_mu)
        with np.errstate(divide="ignore"):
            fac_full = np.where(ls_full >= 2, 1.0 / np.sqrt(np.maximum(
                1.0, (ls_full - 1.0) * ls_full * (ls_full + 1.0)
                * (ls_full + 2.0))), 0.0)
        fac_t = fac_full[:l_max_t]
        tr_static = dict(mu_t=mu_t, w_t=w_t, Pt=Pt, P2t=P2t, R2t=R2t,
                         T2t=T2t, fac_full=fac_full, fac_t=fac_t)

    profile_shape = jnp.asarray(profile_shape)
    tau_ref = aer.tau_ref

    def fn(theta):
        greek6, ssa_raw, k_band = _nai2_jax(theta, **g_band)
        k_ref = _bulk_extinction_jax(theta, fixed_m=fixed_m, **g_ref)
        if truncate:
            greek6, ft = _delta_bge_jax(greek6, l_max_t, **tr_static)
        else:
            ft = 0.0
        k_scale = k_band / k_ref
        tau_prof = tau_ref * k_scale * profile_shape
        tau_mod = (1.0 - ft * ssa_raw) * tau_prof
        ssa_mod = (1.0 - ft) * ssa_raw / (1.0 - ft * ssa_raw)
        return {"greek": jnp.stack(greek6), "ssa": ssa_mod,
                "tau_profile": tau_mod, "k_over_kref": k_scale}

    return fn, theta0


def exact_aerosol_mie_tangents(aer, scat, lam_band: float, profile_shape,
                               use_bge: bool, l_cap: int):
    """Exact d{greek, ssa, tau_profile}/d(n_r, n_i, mu_log, sigma_log).

    Returns (primal_out, jac) as numpy pytrees; jac leaves have a trailing
    parameter axis of size 4 in the order (n_r, n_i, mu_log, sigma_log).
    """
    fn, theta0 = build_lin_aerosol_fn(aer, scat, lam_band, profile_shape,
                                      use_bge, l_cap)
    # Host-side stage by design (SURVEY §7 decision: Mie runs f64 on CPU —
    # TPU has no complex128; the reference's GPU Mie uses double-float
    # emulation instead, compute_NAI2.jl). Pin explicitly so a TPU default
    # backend doesn't capture the trace.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        theta = jnp.asarray(theta0, jnp.float64)
        primal = fn(theta)
        jac = jax.jacfwd(fn)(theta)
    to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
    return to_np(primal), to_np(jac)


def greek_tangent_as_coefs(jac_greek, i_param: int) -> GreekCoefs:
    """Slice the stacked (6, L, 4) greek Jacobian into a GreekCoefs tangent."""
    g = jac_greek[:, :, i_param]
    return GreekCoefs(*[np.asarray(g[i]) for i in range(6)])
