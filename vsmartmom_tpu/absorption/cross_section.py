"""Line-by-line absorption cross-sections, batched for XLA.

Behavioral reference:
/root/reference/src/Absorption/compute_absorption_cross_section.jl and
make_model_helpers.jl. Line pre-processing (pressure shift, Lorentz/Doppler
widths, TIPS intensity correction) runs on host float64 NumPy; the hot
line-summation runs as a jitted chunked ``lax.scan``: each chunk of lines is
evaluated against the full spectral grid as one dense (chunk, nGrid) Voigt
block (a pure VPU broadcast), wing-cutoff-masked, and summed — the XLA
equivalent of the reference's one-workitem-per-gridpoint KernelAbstractions
kernel (line_shape_batch!, l.252-319).
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .hitran import HitranTable, mol_weight, qoft
from .voigt import CEFS

C2 = 1.4387769               # second radiation constant [cm K]
P_REF = 1013.25              # [hPa]
T_REF = 296.0                # [K]
MASS_MOL = 1.66053873e-27    # [kg per unit molar mass molecule]
C_LIGHT = 2.99792458e8       # [m/s]
K_BOLTZ = 1.3806503e-23      # [J/K]
SQRT_LN2 = float(np.sqrt(np.log(2.0)))
SQRT2_LN2 = float(np.sqrt(2.0 * np.log(2.0)))
SQRT_LN2_PI = float(np.sqrt(np.log(2.0) / np.pi))

LINE_CHUNK = 256


@dataclass
class HitranModel:
    """Reference Absorption/types.jl:168-189."""
    hitran: HitranTable
    broadening: str = "Voigt"            # Voigt | Lorentz | Doppler
    wing_cutoff: float = 40.0            # [cm^-1]
    cef: str = "HumlicekWeidemann32SDErrorFunction"
    vmr: float = 0.0                     # self-broadening VMR


def _preprocess_lines(model: HitranModel, grid, pressure, temperature):
    """Active-line parameters at (p, T) (compute_absorption_cross_section.jl:77-154).

    Returns (nu, gamma_d, gamma_l, y, S) float64 arrays.
    """
    h = model.hitran
    grid = np.asarray(grid)
    lo, hi = grid.min() - model.wing_cutoff, grid.max() + model.wing_cutoff
    active = (h.nu > lo) & (h.nu < hi)
    if not active.any():
        return tuple(np.zeros(0) for _ in range(5))

    nu0 = h.nu[active]
    nu = nu0 + pressure / P_REF * h.delta_air[active]
    gamma_l = ((h.gamma_air[active] * (1 - model.vmr) * pressure / P_REF
                + h.gamma_self[active] * model.vmr * pressure / P_REF)
               * (T_REF / temperature) ** h.n_air[active])
    masses = np.array([mol_weight(int(m), int(i))
                       for m, i in zip(h.mol[active], h.iso[active])])
    gamma_d = (SQRT2_LN2 / C_LIGHT * np.sqrt(K_BOLTZ / MASS_MOL)
               * np.sqrt(temperature) * nu0 / np.sqrt(masses))
    y = SQRT_LN2 * gamma_l / gamma_d

    S = h.sw[active].copy()
    e_low = h.e_lower[active]
    has_e = e_low != -1
    if has_e.any():
        cache = {}
        for mi in np.unique(np.stack([h.mol[active], h.iso[active]], 1), axis=0):
            cache[tuple(mi)] = qoft(int(mi[0]), int(mi[1]), temperature, T_REF)
        q_ratio = np.array([cache[(int(m), int(i))]
                            for m, i in zip(h.mol[active], h.iso[active])])
        corr = (q_ratio * np.exp(C2 * e_low * (1 / T_REF - 1 / temperature))
                * (-np.expm1(-C2 * nu0 / temperature))
                / (-np.expm1(-C2 * nu0 / T_REF)))
        S = np.where(has_e, S * corr, S)
    return nu, gamma_d, gamma_l, y, S


@partial(jax.jit, static_argnames=("broadening", "cef", "n_chunks"))
def _line_sum(grid, nu, gamma_d, gamma_l, y, S, wing_cutoff,
              broadening: str, cef: str, n_chunks: int):
    """sigma(grid) = sum over lines of S * profile(grid - nu), chunked scan."""
    chunk = nu.shape[0] // n_chunks
    xs = tuple(a.reshape(n_chunks, chunk) for a in (nu, gamma_d, gamma_l, y, S))
    cef_fn = CEFS[cef]

    def body(acc, xs_c):
        nu_c, gd_c, gl_c, y_c, S_c = (a[:, None] for a in xs_c)
        dx = grid[None, :] - nu_c                      # (chunk, nGrid)
        if broadening == "Voigt":
            z = SQRT_LN2 / gd_c * dx + 1j * y_c
            prof = S_c * SQRT_LN2_PI / gd_c * cef_fn(z).real
        elif broadening == "Lorentz":
            prof = S_c * gl_c / (jnp.pi * (gl_c ** 2 + dx ** 2))
        else:  # Doppler
            prof = S_c * SQRT_LN2_PI / gd_c * \
                jnp.exp(-np.log(2.0) * (dx / gd_c) ** 2)
        prof = jnp.where(jnp.abs(dx) <= wing_cutoff, prof, 0.0)
        return acc + prof.sum(axis=0), None

    acc0 = jnp.zeros_like(grid)
    acc, _ = jax.lax.scan(body, acc0, xs)
    return acc


def _profile(dx, gd_c, gl_c, y_c, S_c, broadening, cef_fn):
    """Line-shape values S * phi(dx) for a (chunk, W) block."""
    if broadening == "Voigt":
        z = SQRT_LN2 / gd_c * dx + 1j * y_c
        return S_c * SQRT_LN2_PI / gd_c * cef_fn(z).real
    if broadening == "Lorentz":
        return S_c * gl_c / (jnp.pi * (gl_c ** 2 + dx ** 2))
    return S_c * SQRT_LN2_PI / gd_c * \
        jnp.exp(-np.log(2.0) * (dx / gd_c) ** 2)


@partial(jax.jit, static_argnames=("broadening", "cef", "n_chunks", "W",
                                   "n_grid"))
def _line_sum_windowed(grid0, dnu, n_grid: int, nu, gamma_d, gamma_l, y, S,
                       wing_cutoff, broadening: str, cef: str,
                       n_chunks: int, W: int):
    """Windowed line sum on a UNIFORM grid: each line evaluates its profile
    only on the W grid points covering [nu - cutoff, nu + cutoff] and
    scatter-adds into the spectrum — O(nLines * W) instead of
    O(nLines * nGrid) (the reference's per-line index ranges,
    compute_absorption_cross_section.jl:100-154, as an XLA scatter-add).
    """
    chunk = nu.shape[0] // n_chunks
    xs = tuple(a.reshape(n_chunks, chunk) for a in (nu, gamma_d, gamma_l, y, S))
    cef_fn = CEFS[cef]
    offs = jnp.arange(W, dtype=jnp.int32)

    def body(acc, xs_c):
        nu_c, gd_c, gl_c, y_c, S_c = (a[:, None] for a in xs_c)
        start = jnp.floor((nu_c - wing_cutoff - grid0) / dnu).astype(jnp.int32)
        idx = start + offs[None, :]                     # (chunk, W)
        in_grid = (idx >= 0) & (idx < n_grid)
        idx_c = jnp.clip(idx, 0, n_grid - 1)
        dx = grid0 + idx_c * dnu - nu_c
        prof = _profile(dx, gd_c, gl_c, y_c, S_c, broadening, cef_fn)
        prof = jnp.where(in_grid & (jnp.abs(dx) <= wing_cutoff), prof, 0.0)
        return acc.at[idx_c.ravel()].add(prof.ravel()), None

    acc0 = jnp.zeros(n_grid, dtype=nu.dtype)
    acc, _ = jax.lax.scan(body, acc0, xs)
    return acc


def _uniform_spacing(grid) -> Optional[float]:
    """Grid spacing if uniform (to 1e-9 relative), else None."""
    if len(grid) < 2:
        return None
    d = np.diff(grid)
    d0 = d[0]
    if d0 <= 0 or np.abs(d - d0).max() > 1e-9 * abs(d0) + 1e-12:
        return None
    return float(d0)


def compute_absorption_cross_section(model: HitranModel, grid, pressure,
                                     temperature,
                                     force_dense: bool = False) -> np.ndarray:
    """Cross-section [cm^2/molecule] on ``grid`` [cm^-1] at (p [hPa], T [K]).

    Uniform grids take the windowed scatter-add path when the per-line
    window is meaningfully narrower than the grid (hyperspectral bands);
    non-uniform grids or narrow bands take the dense masked path.
    """
    grid = np.asarray(grid, dtype=np.float64)
    nu, gd, gl, y, S = _preprocess_lines(model, grid, pressure, temperature)
    n = len(nu)
    if n == 0:
        return np.zeros_like(grid)
    # pad to a chunk multiple with zero-strength lines
    n_pad = (-n) % LINE_CHUNK
    if n_pad:
        pad = lambda a, v=0.0: np.concatenate([a, np.full(n_pad, v)])
        nu, S = pad(nu, grid[0]), pad(S)
        gd, gl, y = pad(gd, 1.0), pad(gl, 1.0), pad(y, 1.0)
    n_chunks = len(nu) // LINE_CHUNK

    dnu = _uniform_spacing(grid)
    if dnu is not None and not force_dense:
        W = int(np.ceil(2.0 * model.wing_cutoff / dnu)) + 2
        if W < len(grid) // 2:
            sigma = _line_sum_windowed(
                grid[0], dnu, len(grid), jnp.asarray(nu), jnp.asarray(gd),
                jnp.asarray(gl), jnp.asarray(y), jnp.asarray(S),
                model.wing_cutoff, model.broadening, model.cef, n_chunks, W)
            return np.asarray(sigma)

    sigma = _line_sum(jnp.asarray(grid), jnp.asarray(nu), jnp.asarray(gd),
                      jnp.asarray(gl), jnp.asarray(y), jnp.asarray(S),
                      model.wing_cutoff, model.broadening, model.cef, n_chunks)
    return np.asarray(sigma)


def compute_absorption_profile(model: HitranModel, grid, vmr, profile):
    """tau_abs (nSpec, Nz): sigma(p, T) * vcd_dry * vmr per layer
    (atmo_prof.jl:464-486)."""
    grid = np.asarray(grid, dtype=np.float64)
    nz = profile.nz
    tau = np.zeros((len(grid), nz))
    vmr_arr = np.broadcast_to(np.asarray(vmr, dtype=np.float64), (nz,)) \
        if np.ndim(vmr) > 0 else np.full(nz, float(vmr))
    for iz in range(nz):
        sigma = compute_absorption_cross_section(
            model, grid, profile.p_full[iz], profile.T[iz])
        tau[:, iz] = sigma * profile.vcd_dry[iz] * vmr_arr[iz]
    return tau


@dataclass
class InterpolationModel:
    """Precomputed sigma LUT over (nu, p, T).

    Interpolation order matches the reference's scaled cubic BSpline
    (compute_absorption_cross_section.jl:198-231) when every axis has
    >= 4 samples; smaller axes fall back to linear per axis. Points
    outside the nu table clamp to zero, p/T clamp to the table edge —
    the reference's extrapolation behavior.
    """
    sigma: np.ndarray            # (n_nu, n_p, n_t)
    nu_grid: np.ndarray
    p_grid: np.ndarray
    t_grid: np.ndarray
    order: str = "cubic"         # "cubic" (reference default) or "linear"

    def _method(self):
        if self.order == "linear":
            return "linear"
        n = (len(self.nu_grid), len(self.p_grid), len(self.t_grid))
        return "cubic" if min(n) >= 4 else "linear"

    def interpolate(self, grid, pressure, temperature):
        from scipy.interpolate import RegularGridInterpolator
        # Normalize: scipy's cubic prefilter silently flushes data at
        # cross-section magnitudes (~1e-23 cm^2) to zero.
        scale = self.sigma.max() or 1.0
        itp = RegularGridInterpolator(
            (self.nu_grid, self.p_grid, self.t_grid), self.sigma / scale,
            method=self._method(), bounds_error=False, fill_value=None)
        grid = np.asarray(grid, dtype=np.float64)
        pts = np.stack([
            np.clip(grid, self.nu_grid[0], self.nu_grid[-1]),
            np.full_like(grid, np.clip(pressure, self.p_grid[0],
                                       self.p_grid[-1])),
            np.full_like(grid, np.clip(temperature, self.t_grid[0],
                                       self.t_grid[-1]))], axis=-1)
        out = itp(pts) * scale
        out[(grid < self.nu_grid[0]) | (grid > self.nu_grid[-1])] = 0.0
        return np.clip(out, 0.0, None)    # cubic overshoot guard

    # -- persistence (reference JLD2 save/load,
    #    make_model_helpers.jl:113-119) --------------------------------
    def save(self, path: str) -> None:
        """Persist the LUT as a compressed .npz artifact."""
        np.savez_compressed(path, sigma=self.sigma, nu_grid=self.nu_grid,
                            p_grid=self.p_grid, t_grid=self.t_grid,
                            order=np.array(self.order))

    @classmethod
    def load(cls, path: str) -> "InterpolationModel":
        with np.load(path, allow_pickle=False) as d:
            return cls(sigma=d["sigma"], nu_grid=d["nu_grid"],
                       p_grid=d["p_grid"], t_grid=d["t_grid"],
                       order=str(d["order"]))


def make_interpolation_model(model: HitranModel, nu_grid, p_grid,
                             t_grid, order: str = "cubic") -> InterpolationModel:
    """Precompute the sigma LUT (make_model_helpers.jl:25-119)."""
    nu_grid = np.asarray(nu_grid, dtype=np.float64)
    sigma = np.zeros((len(nu_grid), len(p_grid), len(t_grid)))
    for ip, p in enumerate(p_grid):
        for it, t in enumerate(t_grid):
            sigma[:, ip, it] = compute_absorption_cross_section(
                model, nu_grid, p, t)
    return InterpolationModel(sigma=sigma, nu_grid=nu_grid,
                              p_grid=np.asarray(p_grid, dtype=np.float64),
                              t_grid=np.asarray(t_grid, dtype=np.float64),
                              order=order)
