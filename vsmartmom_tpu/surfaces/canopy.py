"""Canopy-coupled surface: vegetation canopy + soil BRDF as the lower
boundary of the atmospheric RT.

Behavioral reference: /root/reference/src/CoreRT/Surfaces/canopy_surface.jl
(CanopySurface + _init_canopy_cache! + create_surface_layer!) and the
CanopyOptics.jl bi-Lambertian leaf scattering model it drives
(sandbox/validate_canopy_Z.jl:25-39, test/test_canopy.jl:17-41).

Physics (re-derived, not ported): leaves are bi-Lambertian plates
(hemispherical reflectance rho_L and transmittance tau_L, ideal-diffuse on
both sides) with a *spherical* leaf-angle distribution (uniform leaf
normals, projection factor G(mu) = 1/2 exactly). The area-scattering phase
function then depends only on the scattering angle beta between incident
and scattered propagation directions (Ross 1981; Shultis & Myneni 1988):

    Gamma(beta) ~ rho_L * Psi-(beta) + tau_L * Psi+(beta)
    Psi-(beta)  = (1/3pi) (sin beta - beta cos beta)           # reflection
    Psi+(beta)  = Psi-(beta) + (1/3) cos beta                  # transmission

Normalizing to the solver's phase-function convention
((1/4pi) Integral p dOmega = 1, i.e. Greek beta_0 = 1) gives

    p(beta) = (8 / 3pi) (sin beta - beta cos beta)
              + (8 tau_L / (3 omega_L)) cos beta,   omega_L = rho_L + tau_L.

Because p is a function of beta only, the canopy slots into the existing
Greek-coefficient -> generalized-spherical-function -> Z-supermatrix
pipeline exactly like an aerosol phase function, and the canopy slab runs
through the same batched elemental/doubling/interaction kernels as the
atmosphere (the reference runs CanopyOptics Z matrices through its internal
adding-doubling the same way, canopy_surface.jl:200-420). Bi-Lambertian
scattering is ideally depolarizing, so only the Greek beta series is
non-zero (scattered light is unpolarized) — matching the scalar
compute_Gamma_isotropic physics of the reference's leaf model.

Canopy optical depth: tau_c = G * Omega_clump * LAI (projected leaf area),
single-scattering albedo = omega_L. Spectral leaf optics are evaluated on a
coarse wavenumber grid and the effective surface operators interpolated to
the computation grid (the reference's coarse-grid Z cache,
canopy_surface.jl:30-36, _build_spectral_canopy_cache).

Non-spherical leaf-angle distributions (LADs) are supported via the exact
Ross projection kernel and a numerical area-scattering Gamma (see
`project_G` / `lad_phase_fourier` below): for a non-uniform leaf-normal
distribution Gamma is no longer a function of the scattering angle alone,
so the Greek/Legendre pipeline is bypassed and the per-moment Z matrices
come from a direct azimuthal Fourier projection; extinction becomes
direction-dependent (G(mu) per stream) and the canopy slab runs through a
directional elemental (`_elemental_directional`, the analogue of the
reference's elemental_canopy.jl) with effective cosines mu/G(mu). The de
Wit trigonometric LAD family is implemented (planophile, erectophile,
plagiophile, extremophile, uniform, spherical — Bunnik 1978); the
reference's CanopyOptics.jl parameterizes the same canopies as Goel &
Strebel Beta distributions, so named-LAD G(mu) curves agree in shape but
not to the last digit.

Per-sublayer heterogeneity (`lai_fractions`) and within-canopy gas
absorption (`include_atm` + `canopy_dp` — reference canopy_surface.jl:
_compute_canopy_atm_tau!/_interleave_atm_layer!) are supported: gap
absorption layers are interleaved between canopy sublayers, and the
effective surface operators are then built on the FULL spectral grid
(line absorption cannot be coarse-node interpolated).

Remaining descope vs reference: Chen-Leblanc clumping (constant-Omega
clumping is supported).
"""

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..scattering.greek import GreekCoefs

#: Spherical (uniform) leaf-angle distribution projection factor.
G_SPHERICAL = 0.5

#: de Wit trigonometric leaf-angle distribution family g(theta_L) on
#: [0, pi/2], normalized to unit integral (Bunnik 1978; Ross 1981).
LAD_FAMILIES = {
    "spherical": lambda t: np.sin(t),
    "uniform": lambda t: np.full_like(t, 2.0 / np.pi),
    "planophile": lambda t: (2.0 / np.pi) * (1.0 + np.cos(2.0 * t)),
    "erectophile": lambda t: (2.0 / np.pi) * (1.0 - np.cos(2.0 * t)),
    "plagiophile": lambda t: (2.0 / np.pi) * (1.0 - np.cos(4.0 * t)),
    "extremophile": lambda t: (2.0 / np.pi) * (1.0 + np.cos(4.0 * t)),
}


def ross_psi(mu, mu_L):
    """Exact azimuth-averaged projection kernel
    psi(mu, mu_L) = (1/2pi) Int |Omega . Omega_L| dphi  (Ross 1981):
    psi = |a| for |a| >= b, else (2/pi)(a phi0 + b sin phi0) - a with
    a = mu mu_L, b = sin(theta) sin(theta_L), phi0 = arccos(-a/b)."""
    mu = np.asarray(mu, dtype=np.float64)[:, None]
    mu_L = np.asarray(mu_L, dtype=np.float64)[None, :]
    a = mu * mu_L
    b = np.sqrt(np.maximum(0.0, 1.0 - mu ** 2)) \
        * np.sqrt(np.maximum(0.0, 1.0 - mu_L ** 2))
    b_safe = np.where(b > 0, b, 1.0)
    phi0 = np.arccos(np.clip(-a / b_safe, -1.0, 1.0))
    general = (2.0 / np.pi) * (a * phi0 + b * np.sin(phi0)) - a
    return np.where(np.abs(a) >= b, np.abs(a), general)


def project_G(mu, lad: str = "spherical", n_gauss: int = 96):
    """Ross projection function G(mu) = Int g(theta_L) psi dtheta_L for a
    named LAD (reference CanopyOptics.G; spherical gives exactly 1/2)."""
    if lad == "spherical":
        return np.full(np.shape(np.atleast_1d(mu)), G_SPHERICAL)
    g = LAD_FAMILIES[lad]
    x, w = np.polynomial.legendre.leggauss(n_gauss)
    tl = 0.25 * np.pi * (x + 1.0)
    wl = 0.25 * np.pi * w
    psi = ross_psi(np.atleast_1d(mu), np.cos(tl))       # (n_mu, n_gauss)
    return psi @ (g(tl) * wl)


def bilambertian_phase(mu, rho: float, tau: float):
    """Normalized scattering phase function p(cos beta) of a bi-Lambertian
    leaf with spherical LAD; (1/4pi) Integral p dOmega = 1."""
    mu = np.asarray(mu, dtype=np.float64)
    omega = rho + tau
    if omega <= 0:
        return np.zeros_like(mu)
    beta = np.arccos(np.clip(mu, -1.0, 1.0))
    sin_b = np.sqrt(np.maximum(0.0, 1.0 - mu ** 2))
    return (8.0 / (3.0 * np.pi)) * (sin_b - beta * mu) \
        + (8.0 * tau / (3.0 * omega)) * mu


def bilambertian_greek(rho: float, tau: float, l_max: int) -> GreekCoefs:
    """Legendre (Greek beta) expansion of the bi-Lambertian canopy phase
    function; alpha/gamma/delta/epsilon/zeta are zero (ideal diffuse leaf
    scattering is fully depolarizing)."""
    # Gauss-Legendre projection on mu in [-1, 1]; p is C^1 (its derivative
    # is -arccos-like), so a few hundred nodes resolve l <= ~100 exactly.
    n_gauss = max(4 * l_max, 128)
    x, w = np.polynomial.legendre.leggauss(n_gauss)
    p = bilambertian_phase(x, rho, tau)
    beta = np.zeros(l_max)
    P_prev = np.ones_like(x)
    P_curr = x.copy()
    for l in range(l_max):
        if l == 0:
            Pl = P_prev
        elif l == 1:
            Pl = P_curr
        else:
            Pl = ((2 * l - 1) * x * P_curr - (l - 1) * P_prev) / l
            P_prev, P_curr = P_curr, Pl
        beta[l] = (2 * l + 1) / 2.0 * np.sum(w * p * Pl)
    z = np.zeros(l_max)
    return GreekCoefs(alpha=z, beta=beta, gamma=z, delta=z,
                      epsilon=z, zeta=z)


def lad_phase_fourier(lad: str, rho: float, tau: float, qp_mu, n_m: int,
                      n_tl: int = 48, n_pl: int = 96, n_dphi: int = 64):
    """Per-Fourier-moment scalar canopy phase kernels for an arbitrary
    LAD, by direct numerical projection (the reference's CanopyOptics
    compute_Z_matrices_aniso path, re-derived):

        Gamma(Om_in -> Om_out) = (1/2pi) Int g(tL) dtL Int dphL
            [rho 1(d_in d_out < 0) + tau 1(> 0)] |d_in| |d_out|,
        p_eff = 4 Gamma / (w_L G(mu_in)),
        Z_m(i, j) = (2 - delta_m0) <p_eff cos(m dphi)>_dphi,

    with d = Om . Om_L. The normalizations are pinned to the spherical
    Greek pipeline: for lad='spherical' the numerical p_eff equals
    bilambertian_phase exactly (measured ratio 0.25 = 1/4 on Gamma) and
    the (2 - delta_m0) Fourier factor matches compute_Z_moments.

    Returns (Z_pp, Z_mp) of shape (n_m, Nq, Nq) — scalar I-block kernels
    (bi-Lambertian scattering is ideally depolarizing; the reference's
    vector canopy leaves Q/U/V blocks empty too, canopy_surface.jl
    _check_Z_flux_conservation docstring).
    """
    qp_mu = np.asarray(qp_mu, dtype=np.float64)
    Nq = len(qp_mu)
    omega = rho + tau
    if omega <= 0:
        z = np.zeros((n_m, Nq, Nq))
        return z, z
    x, w = np.polynomial.legendre.leggauss(n_tl)
    tl = 0.25 * np.pi * (x + 1.0)
    wl = 0.25 * np.pi * w * LAD_FAMILIES[lad](tl)          # g-weighted
    mu_L = np.cos(tl)
    s_L = np.sin(tl)
    phl = 2.0 * np.pi * np.arange(n_pl) / n_pl
    dphi = 2.0 * np.pi * np.arange(n_dphi) / n_dphi

    s_mu = np.sqrt(np.maximum(0.0, 1.0 - qp_mu ** 2))
    G_in = project_G(qp_mu, lad)

    # d factors: leaf-normal grid (L = (tl, phl)) dotted with stream
    # directions. Incident propagation is DOWN (-mu_j), azimuth 0;
    # outgoing azimuth dphi with z-comp -mu_i (Z++) or +mu_i (Z-+).
    # d_in: (Nq, n_tl, n_pl)
    d_in = (-qp_mu[:, None, None] * mu_L[None, :, None]
            + s_mu[:, None, None] * s_L[None, :, None]
            * np.cos(phl)[None, None, :])
    # d_out: (n_dphi, Nq, n_tl, n_pl)
    cos_out = np.cos(dphi[:, None, None, None] - phl[None, None, None, :])
    s_part = s_mu[None, :, None, None] * s_L[None, None, :, None] * cos_out
    z_part = qp_mu[None, :, None, None] * mu_L[None, None, :, None]
    d_up = z_part + s_part
    d_dn = -z_part + s_part

    wgt = wl[:, None] * (1.0 / n_pl)                        # (n_tl, n_pl)
    cos_m = np.cos(np.outer(np.arange(n_m), dphi))          # (n_m, n_dphi)
    cos_m *= np.where(np.arange(n_m) == 0, 1.0, 2.0)[:, None] / n_dphi

    Z_pp = np.zeros((n_m, Nq, Nq))
    Z_mp = np.zeros((n_m, Nq, Nq))
    for j in range(Nq):                                     # incident
        dj = d_in[j]                                        # (n_tl, n_pl)
        for (d_out, Z) in ((d_dn, Z_pp), (d_up, Z_mp)):
            prod = d_out * dj[None, None, :, :]
            f = np.where(prod < 0.0, rho, tau) * np.abs(prod)
            gam = np.einsum("ditp,tp->di", f, wgt)          # (n_dphi, Nq)
            p_eff = 4.0 * gam / (omega * G_in[j])
            Z[:, :, j] = cos_m @ p_eff                      # (n_m, Nq)
    return Z_pp, Z_mp


def _scalar_to_super(Z_scalar, ns: int):
    """(Nq, Nq) scalar I-kernel -> (Nq ns, Nq ns) supermatrix with the
    I->I block populated (depolarizing diffuse scattering)."""
    Nq = Z_scalar.shape[0]
    Z = np.zeros((Nq * ns, Nq * ns))
    Z[::ns, ::ns] = Z_scalar
    return Z


def _elemental_directional(wZ_pp, wZ_mp, L_sub, att_solar, qp_mu_N, wt_mu_N,
                           G_N, mu0, G0, i_mu0_start, ns, F0, fourier_w):
    """Exact finite-slab elemental operators with DIRECTION-DEPENDENT
    extinction k(mu) = G(mu)/mu per unit leaf area (the reference's
    elemental_canopy.jl physics, re-derived): with effective cosines
    mu~ = mu/G(mu), the Fell operators keep their form with mu~ in every
    exponential/denominator and a single G-bookkeeping prefactor:

      r(i,j)  = fw wZ-+ wt_j [mu_j / (G_i (mu~_i + mu~_j))] (1 - e^{-L(1/mu~_i + 1/mu~_j)})
      t(i,j)  = fw wZ++ wt_j [mu_j / (G_i (mu~_i - mu~_j))] (e^{-L/mu~_i} - e^{-L/mu~_j})
      t(i,i) += e^{-L/mu~_i}                          (Beer diagonal)

    (spherical limit mu~ = 2 mu reproduces kernels.elemental exactly).
    Host-side f64 numpy; L_sub is the (possibly spectral, (nb,)) sublayer
    LEAF area index times the clumping factor.
    """
    qp = np.asarray(qp_mu_N, dtype=np.float64)
    wt = np.asarray(wt_mu_N, dtype=np.float64)
    G_N = np.asarray(G_N, dtype=np.float64)
    mu_t = qp / G_N
    mu0_t = mu0 / G0
    L = np.atleast_1d(np.asarray(L_sub, dtype=np.float64))[:, None, None]

    mu_i, mu_j = qp[:, None], qp[None, :]
    mt_i, mt_j = mu_t[:, None], mu_t[None, :]
    G_i = G_N[:, None]
    wct = fourier_w * wt[None, :]

    E = np.exp(-L / mu_t[None, None, :])                    # (nb, 1, Np)->cols
    E_i = np.exp(-L / mu_t[None, :, None])
    r_geom = mu_j / (G_i * (mt_i + mt_j)) * wct
    one_m_EE = -np.expm1(-L * (1.0 / mt_i + 1.0 / mt_j)[None])
    r_mp = wZ_mp * r_geom[None] * one_m_EE

    # transmission: (E_i - E_j)/(mt_i - mt_j) via the cancellation-free
    # E_j expm1(x)/x form, x = L (1/mt_j - 1/mt_i)
    x = L * (1.0 / mt_j - 1.0 / mt_i)[None]
    xr = np.where(x == 0.0, 1.0,
                  np.expm1(x) / np.where(x == 0.0, 1.0, x))
    # (E_i - E_j)/(mt_i - mt_j) = E_j expm1(x) L / (mt_i mt_j x)
    ratio = E * xr * L / (mt_i * mt_j)[None]
    t_geom = (mu_j / G_i) * wct
    t_pp = wZ_pp * t_geom[None] * ratio
    nb, Np = t_pp.shape[0], t_pp.shape[1]
    t_pp = t_pp + E_i * np.eye(Np)[None]

    # solar sources: incident beam mu0 (effective mu0_t), unit F0 columns
    sl = slice(i_mu0_start, i_mu0_start + ns)
    Zp_I0 = np.einsum("bik,kb->bi", wZ_pp[:, :, sl], F0)
    Zm_I0 = np.einsum("bik,kb->bi", wZ_mp[:, :, sl], F0)
    Lv = L[..., 0]                                          # (nb, 1)
    E_0 = np.exp(-Lv / mu0_t)
    j_m = fourier_w * Zm_I0 * (mu0 / (G_N * (mu_t + mu0_t)))[None] \
        * (-np.expm1(-Lv * (1.0 / mu_t[None, :] + 1.0 / mu0_t)))
    y = Lv * (1.0 / mu0_t - 1.0 / mu_t[None, :])
    yr = np.where(y == 0.0, 1.0, np.expm1(y) / np.where(y == 0.0, 1.0, y))
    # (E_i - E_0)/(k_0 - k_i) = L E_0 expm1(y)/y,  y = L(1/mu0~ - 1/mu~_i)
    ratio_v = E_0 * yr * Lv / (mu_t[None, :] * mu0_t)
    j_p = fourier_w * Zp_I0 * (mu0 / G_N)[None] * ratio_v
    att = np.atleast_1d(att_solar)[:, None]
    return r_mp, t_pp, j_p * att, j_m * att


@dataclass
class CanopySurface:
    """Canopy + soil lower boundary (reference CoreRT/types.jl:560-647).

    soil: a SurfaceDescriptor (any supported surface type) for the ground
    below the canopy. leaf_reflectance/transmittance may be scalars or
    arrays on ``leaf_optics_grid`` (grid_unit 'nm' wavelengths or 'wn'
    wavenumbers in cm^-1).
    """
    soil: object
    LAI: float = 3.0
    n_layers: int = 1
    leaf_reflectance: object = 0.4
    leaf_transmittance: object = 0.05
    leaf_optics_grid: Optional[np.ndarray] = None
    grid_unit: str = "nm"
    clumping_omega: float = 1.0     # ConstantClumping Omega (1 = no clumping)
    lad: str = "spherical"          # leaf-angle distribution (LAD_FAMILIES)
    lai_fractions: Optional[tuple] = None
                                    # per-sublayer LAI fractions (len
                                    # n_layers; None = uniform split)
    include_atm: bool = False       # interleave within-canopy gas absorption
    canopy_dp: Optional[float] = None
                                    # within-canopy pressure depth [hPa] for
                                    # include_atm (canopy_surface.jl
                                    # _compute_canopy_atm_tau!)
    n_coarse: int = 7               # coarse spectral nodes for Z cache
    # Canopy sublayer doubling target. The exact-single-scatter elemental
    # truncates multiple scattering within d_tau, an O(d_tau) *total* energy
    # error after composing tau_c/d_tau slabs (measured: 0.6% leak at
    # d_tau = 7e-4, halving per doubling). 2e-5 keeps closure ~< 1e-4 while
    # adding only ~6 doublings — the canopy build is per-moment host work,
    # not the hot path.
    dtau_max: float = 2e-5

    def leaf_grid_wn(self) -> Optional[np.ndarray]:
        if self.leaf_optics_grid is None:
            return None
        g = np.asarray(self.leaf_optics_grid, dtype=np.float64)
        return 1e7 / g if self.grid_unit == "nm" else g

    def tau_canopy(self) -> float:
        """Nadir-projected canopy optical depth (spherical-G bookkeeping;
        directional paths use project_G per stream)."""
        return G_SPHERICAL * self.clumping_omega * self.LAI

    def sublayer_lai(self) -> np.ndarray:
        """Clumped leaf-area index per sublayer (reference _sublayer_lai:
        LAI * lai_fractions[i], or a uniform LAI / n_layers split)."""
        n = max(1, int(self.n_layers))
        if self.lai_fractions is not None:
            fr = np.asarray(self.lai_fractions, dtype=np.float64)
            assert len(fr) == n, (len(fr), n)
            lai = self.LAI * fr
        else:
            lai = np.full(n, self.LAI / n)
        return self.clumping_omega * lai


def _leaf_optics_nodes(canopy: CanopySurface, nu_grid):
    """Coarse wavenumber nodes + leaf (rho, tau) at each node.

    Scalar leaf optics -> a single node. Spectral leaf optics -> up to
    ``n_coarse`` nodes spanning the band (reference
    _build_spectral_canopy_cache coarse grid)."""
    grid_wn = canopy.leaf_grid_wn()
    if grid_wn is None:
        return (np.array([float(np.mean(nu_grid))]),
                np.array([float(canopy.leaf_reflectance)]),
                np.array([float(canopy.leaf_transmittance)]))
    order = np.argsort(grid_wn)
    grid_wn = grid_wn[order]
    R = np.asarray(canopy.leaf_reflectance, dtype=np.float64)[order]
    T = np.asarray(canopy.leaf_transmittance, dtype=np.float64)[order]
    lo, hi = float(np.min(nu_grid)), float(np.max(nu_grid))
    n_nodes = max(2, min(canopy.n_coarse,
                         int(np.sum((grid_wn >= lo) & (grid_wn <= hi))) + 2))
    nodes = np.linspace(lo, hi, n_nodes)
    R_n = np.interp(nodes, grid_wn, R)
    T_n = np.interp(nodes, grid_wn, T)
    return nodes, R_n, T_n


def canopy_surface_arrays(canopy: CanopySurface, quad, pol, n_m: int,
                          nu_grid, soil_r, soil_j, soil_spec,
                          atm_tau=None):
    """Effective canopy+soil surface operators per Fourier moment.

    Runs the canopy slab (bi-Lambertian Z matrices, tau_c = G Omega LAI,
    ssa = rho+tau) through the solver's own elemental/doubling kernels and
    adds it onto the soil surface layer — once per coarse leaf-optics node,
    batched over (node, incident Stokes component) along the kernels'
    spectral axis. Host-side model-build work (f64), like the reference's
    _init_canopy_cache!.

    Returns (node_wn, R_eff (n_m, n_nodes, N, N), J_eff (n_m, n_nodes, N,
    ns)) in the solver's surface-operator convention: R_eff already includes
    all quadrature factors; J_eff[:, :, :, k] is the upwelling source
    response to a unit direct beam e_k at canopy top (before the
    exp(-tau_atm/mu0) attenuation, which _surface_layer applies).
    """
    import jax.numpy as jnp

    from ..core.kernels import (doubling, elemental, identity_composite,
                                interaction, AddedLayer)
    from ..core.types import stokes_d_vector
    from ..scattering.zmatrix import compute_Z_moments

    ns = pol.n
    N = quad.Nquad * ns
    mu0 = float(quad.qp_mu[quad.i_mu0])
    i_mu0_start = quad.i_mu0 * ns

    use_atm = bool(canopy.include_atm) and atm_tau is not None \
        and canopy.n_layers > 1 and np.any(np.asarray(atm_tau) != 0.0)
    if use_atm:
        # Within-canopy line absorption cannot be coarse-node interpolated:
        # build the effective operators on the FULL spectral grid.
        nodes = np.asarray(nu_grid, dtype=np.float64)
        grid_wn = canopy.leaf_grid_wn()
        if grid_wn is None:
            R_leaf = np.full(len(nodes), float(canopy.leaf_reflectance))
            T_leaf = np.full(len(nodes), float(canopy.leaf_transmittance))
        else:
            order = np.argsort(grid_wn)
            R_leaf = np.interp(nodes, grid_wn[order],
                               np.asarray(canopy.leaf_reflectance,
                                          dtype=np.float64)[order])
            T_leaf = np.interp(nodes, grid_wn[order],
                               np.asarray(canopy.leaf_transmittance,
                                          dtype=np.float64)[order])
        tau_gap_nodes = np.asarray(atm_tau, dtype=np.float64) \
            / max(1, canopy.n_layers - 1)
    else:
        nodes, R_leaf, T_leaf = _leaf_optics_nodes(canopy, nu_grid)
        tau_gap_nodes = None
    n_nodes = len(nodes)
    nb = n_nodes * ns                        # batch: node-major, Stokes-minor

    soil_spec_nodes = np.interp(nodes, np.sort(np.asarray(nu_grid)),
                                np.asarray(soil_spec)[np.argsort(nu_grid)]) \
        if len(np.atleast_1d(soil_spec)) > 1 else \
        np.full(n_nodes, float(np.atleast_1d(soil_spec)[0]))

    omega = R_leaf + T_leaf                                   # (n_nodes,)
    L_subs = canopy.sublayer_lai()           # clumped LAI per sublayer
    n_sub = len(L_subs)

    directional = canopy.lad != "spherical"
    G_N = project_G(np.asarray(quad.qp_mu_N), canopy.lad)
    G0 = float(project_G(np.array([mu0]), canopy.lad)[0])
    G_max = float(np.max(G_N)) if directional else G_SPHERICAL

    def _ndoubl(L_k):
        t_eff = L_k * G_max
        return 0 if t_eff <= canopy.dtau_max else \
            int(np.ceil(np.log2(t_eff / canopy.dtau_max)))

    # Cap the Greek series at the stream limit 2*Nstreams - 1 (the same
    # contract aerosols get via delta-truncation, rt_set_streams.jl:25-47):
    # the weighted Gauss nodes can only integrate moments up to that order,
    # so a longer series breaks discrete energy closure.
    l_max = min(max(n_m + 1, 3), 2 * quad.Nstreams - 1)

    d_vec = jnp.asarray(stokes_d_vector(ns, quad.Nquad), jnp.float64)
    # Unit incident Stokes beams, batched: F0[:, node*ns + k] = e_k
    F0 = np.zeros((ns, nb))
    for node in range(n_nodes):
        for k in range(ns):
            F0[k, node * ns + k] = 1.0

    qp_mu_N = jnp.asarray(quad.qp_mu_N, jnp.float64)
    wt_mu_N = jnp.asarray(quad.wt_mu_N, jnp.float64)

    # Non-spherical LAD: one numerical Gamma -> Z projection per distinct
    # leaf-optics ratio (the kernels depend on rho/tau only through the
    # rho:tau split; omega scales out).
    if directional:
        Z_dir = {}
        for node in range(n_nodes):
            key = (round(float(R_leaf[node]), 9),
                   round(float(T_leaf[node]), 9))
            if key not in Z_dir:
                Z_dir[key] = lad_phase_fourier(
                    canopy.lad, key[0], key[1], np.asarray(quad.qp_mu_N),
                    n_m)

    # Per-node solar-path accumulator (within-canopy leaf + gas depth).
    tau_solar = np.zeros(nb)

    R_eff = np.zeros((n_m, n_nodes, N, N))
    J_eff = np.zeros((n_m, n_nodes, N, ns))

    comps = [identity_composite(nb, N, jnp.float64, 1) for _ in range(n_m)]
    for iz in range(n_sub):
        L_k = float(L_subs[iz])
        ndoubl = _ndoubl(L_k)
        dL = L_k / (2 ** ndoubl)
        att_solar = np.exp(-tau_solar / mu0)
        for m in range(n_m):
            fourier_w = 0.5 if m == 0 else 0.25
            wZ_pp = np.zeros((nb, N, N))
            wZ_mp = np.zeros((nb, N, N))
            for node in range(n_nodes):
                if directional:
                    key = (round(float(R_leaf[node]), 9),
                           round(float(T_leaf[node]), 9))
                    Zpp = _scalar_to_super(Z_dir[key][0][m], ns)
                    Zmp = _scalar_to_super(Z_dir[key][1][m], ns)
                else:
                    gk = bilambertian_greek(R_leaf[node], T_leaf[node],
                                            l_max)
                    Zpp, Zmp = compute_Z_moments(pol, quad.qp_mu, gk, m)
                for k in range(ns):
                    wZ_pp[node * ns + k] = omega[node] * Zpp
                    wZ_mp[node * ns + k] = omega[node] * Zmp

            if directional:
                r_mp, t_pp, j_p, j_m = _elemental_directional(
                    wZ_pp, wZ_mp, dL, att_solar, np.asarray(quad.qp_mu_N),
                    np.asarray(quad.wt_mu_N), G_N, mu0, G0, i_mu0_start,
                    ns, F0, fourier_w)
                r_mp, t_pp = jnp.asarray(r_mp), jnp.asarray(t_pp)
                j_p, j_m = jnp.asarray(j_p), jnp.asarray(j_m)
                expk = jnp.full((nb, 1), np.exp(-dL * G0 / mu0),
                                jnp.float64)
            else:
                dtau = jnp.full((nb,), G_SPHERICAL * dL, jnp.float64)
                r_mp, t_pp, j_p, j_m = elemental(
                    jnp.asarray(wZ_pp), jnp.asarray(wZ_mp), dtau,
                    jnp.asarray(tau_solar), qp_mu_N, wt_mu_N,
                    mu0, i_mu0_start, ns, jnp.asarray(F0), fourier_w)
                expk = jnp.exp(-dtau / mu0)[:, None]
            add = doubling(r_mp, t_pp, j_p[..., None], j_m[..., None],
                           expk, ndoubl, d_vec)
            comps[m] = interaction(comps[m], add)
        tau_solar = tau_solar + G0 * L_k

        if use_atm and iz < n_sub - 1:
            # Absorption-only gap layer between canopy sublayers
            # (_interleave_atm_layer!): t = diag(e^{-tau_gap/mu_i}),
            # r = 0, no sources; the solar path picks up tau_gap too.
            tg = np.repeat(tau_gap_nodes, ns)                 # (nb,)
            t_gap = jnp.asarray(
                np.eye(N)[None] * np.exp(
                    -tg[:, None, None]
                    / np.asarray(quad.qp_mu_N)[None, :, None]))
            zero_m = jnp.zeros((nb, N, N))
            zeros_v = jnp.zeros((nb, N, 1))
            gap = AddedLayer(zero_m, zero_m, t_gap, t_gap, zeros_v,
                             zeros_v)
            for m in range(n_m):
                comps[m] = interaction(comps[m], gap)
            tau_solar = tau_solar + tg

    att_c = np.exp(-tau_solar / mu0).reshape(n_nodes, ns)[:, 0]
    for m in range(n_m):
        # Soil as a surface AddedLayer under the canopy: reflection operator
        # scaled by the node's spectral albedo; its solar source is the soil
        # BRDF response to the canopy-attenuated direct beam
        # (_surface_layer semantics with att = exp(-tau_solar/mu0)).
        r_soil = jnp.asarray(soil_r[m])[None] * soil_spec_nodes[:, None, None]
        r_soil = jnp.repeat(r_soil, ns, axis=0)               # (nb, N, N)
        eye_b = jnp.broadcast_to(jnp.eye(N), (nb, N, N))
        jm_soil = jnp.einsum("ik,kb->bi", jnp.asarray(soil_j[m]),
                             jnp.asarray(F0)) \
            * np.repeat(att_c * soil_spec_nodes, ns)[:, None]
        zeros_v = jnp.zeros((nb, N, 1))
        soil_add = AddedLayer(r_soil, jnp.zeros_like(r_soil), eye_b, eye_b,
                              zeros_v, jm_soil[..., None])
        out = interaction(comps[m], soil_add)

        R_np = np.asarray(out.R_mp).reshape(n_nodes, ns, N, N)
        J_np = np.asarray(out.J0_m[..., 0]).reshape(n_nodes, ns, N)
        R_eff[m] = R_np[:, 0]                 # R is beam-independent
        J_eff[m] = np.transpose(J_np, (0, 2, 1))
    return nodes, R_eff, J_eff


def interp_surface_operators(nodes, R_eff, J_eff, nu_grid):
    """Linearly interpolate per-node effective surface operators onto the
    full spectral grid -> (n_m, n_spec, N, N) / (n_m, n_spec, N, ns)."""
    nu = np.asarray(nu_grid, dtype=np.float64)
    if len(nodes) == 1:
        n_spec = len(nu)
        return (np.broadcast_to(R_eff[:, 0][:, None], (R_eff.shape[0], n_spec)
                                + R_eff.shape[2:]).copy(),
                np.broadcast_to(J_eff[:, 0][:, None], (J_eff.shape[0], n_spec)
                                + J_eff.shape[2:]).copy())
    idx = np.clip(np.searchsorted(nodes, nu) - 1, 0, len(nodes) - 2)
    x0, x1 = nodes[idx], nodes[idx + 1]
    w = np.clip((nu - x0) / np.where(x1 > x0, x1 - x0, 1.0), 0.0, 1.0)
    R = R_eff[:, idx] + w[None, :, None, None] * (R_eff[:, idx + 1]
                                                  - R_eff[:, idx])
    J = J_eff[:, idx] + w[None, :, None, None] * (J_eff[:, idx + 1]
                                                  - J_eff[:, idx])
    return R, J
