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

Descoped vs reference (documented): non-spherical LADs (planophile etc. —
their Gamma is no longer a function of beta alone; CanopyOptics numerics),
Chen-Leblanc clumping (constant-Omega clumping is supported), per-sublayer
`lai_fractions` heterogeneity, and `include_atm` within-canopy gas
absorption.
"""

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..scattering.greek import GreekCoefs

#: Spherical (uniform) leaf-angle distribution projection factor.
G_SPHERICAL = 0.5


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
        return G_SPHERICAL * self.clumping_omega * self.LAI


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
                          nu_grid, soil_r, soil_j, soil_spec):
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

    nodes, R_leaf, T_leaf = _leaf_optics_nodes(canopy, nu_grid)
    n_nodes = len(nodes)
    nb = n_nodes * ns                        # batch: node-major, Stokes-minor

    soil_spec_nodes = np.interp(nodes, np.sort(np.asarray(nu_grid)),
                                np.asarray(soil_spec)[np.argsort(nu_grid)]) \
        if len(np.atleast_1d(soil_spec)) > 1 else \
        np.full(n_nodes, float(np.atleast_1d(soil_spec)[0]))

    tau_c = canopy.tau_canopy()
    omega = R_leaf + T_leaf                                   # (n_nodes,)
    n_sub = max(1, int(canopy.n_layers))
    tau_sub = tau_c / n_sub
    ndoubl = 0 if tau_sub <= canopy.dtau_max else \
        int(np.ceil(np.log2(tau_sub / canopy.dtau_max)))

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
    F0 = jnp.asarray(F0)

    qp_mu_N = jnp.asarray(quad.qp_mu_N, jnp.float64)
    wt_mu_N = jnp.asarray(quad.wt_mu_N, jnp.float64)

    R_eff = np.zeros((n_m, n_nodes, N, N))
    J_eff = np.zeros((n_m, n_nodes, N, ns))
    att_c = np.exp(-tau_c / mu0)

    for m in range(n_m):
        fourier_w = 0.5 if m == 0 else 0.25
        # Per-node omega*Z (scattering differs across nodes through tau/omega
        # in the phase and through omega itself).
        wZ_pp = np.zeros((nb, N, N))
        wZ_mp = np.zeros((nb, N, N))
        for node in range(n_nodes):
            gk = bilambertian_greek(R_leaf[node], T_leaf[node], l_max)
            Zpp, Zmp = compute_Z_moments(pol, quad.qp_mu, gk, m)
            for k in range(ns):
                wZ_pp[node * ns + k] = omega[node] * Zpp
                wZ_mp[node * ns + k] = omega[node] * Zmp
        wZ_pp = jnp.asarray(wZ_pp)
        wZ_mp = jnp.asarray(wZ_mp)

        comp = identity_composite(nb, N, jnp.float64, 1)
        dtau = jnp.full((nb,), tau_sub / (2 ** ndoubl), jnp.float64)
        for iz in range(n_sub):
            tau_above = jnp.full((nb,), iz * tau_sub, jnp.float64)
            r_mp, t_pp, j_p, j_m = elemental(
                wZ_pp, wZ_mp, dtau, tau_above, qp_mu_N, wt_mu_N,
                mu0, i_mu0_start, ns, F0, fourier_w)
            expk = jnp.exp(-dtau / mu0)[:, None]
            add = doubling(r_mp, t_pp, j_p[..., None], j_m[..., None],
                           expk, ndoubl, d_vec)
            comp = interaction(comp, add)

        # Soil as a surface AddedLayer under the canopy: reflection operator
        # scaled by the node's spectral albedo; its solar source is the soil
        # BRDF response to the canopy-attenuated direct beam
        # (_surface_layer semantics with att = exp(-tau_c/mu0)).
        r_soil = jnp.asarray(soil_r[m])[None] * soil_spec_nodes[:, None, None]
        r_soil = jnp.repeat(r_soil, ns, axis=0)               # (nb, N, N)
        eye_b = jnp.broadcast_to(jnp.eye(N), (nb, N, N))
        jm_soil = jnp.einsum("ik,kb->bi", jnp.asarray(soil_j[m]), F0) \
            * (att_c * np.repeat(soil_spec_nodes, ns))[:, None]
        zeros_v = jnp.zeros((nb, N, 1))
        soil_add = AddedLayer(r_soil, jnp.zeros_like(r_soil), eye_b, eye_b,
                              zeros_v, jm_soil[..., None])
        out = interaction(comp, soil_add)

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
