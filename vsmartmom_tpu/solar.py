"""Solar / blackbody source spectra.

Behavioral reference: /root/reference/src/SolarModel/SolarModel.jl.
Planck spectra in wavenumber and wavelength space, plus a loader for a
Kurucz-style merged solar spectrum file. The reference downloads its solar
artifact (600-26316 cm^-1, SHA-256 pinned) from the network; this
environment is zero-egress, so the loader takes an explicit local path
(two-column text or .npy of [wavenumber, irradiance]) and interpolates onto
the model grid.
"""

import numpy as np

C1_WN = 1.1910427e-5      # mW / (m^2 sr cm^-1)
C2_WN = 1.4387752         # K cm
C1_WL = 1.1910427e8       # W / (m^2 sr um)
C2_WL = 1.4387752e4       # K um


def planck_spectrum_wn(T: float, nu_grid) -> np.ndarray:
    """Blackbody radiance [mW m^-2 sr^-1 / cm^-1] on wavenumber grid [cm^-1]
    (SolarModel.jl:26-35)."""
    nu = np.asarray(nu_grid, dtype=np.float64)
    return C1_WN * nu ** 3 / np.expm1(C2_WN * nu / T)


def planck_spectrum_wl(T: float, lam_grid_um) -> np.ndarray:
    """Blackbody radiance [W m^-2 sr^-1 / um] on wavelength grid [um]
    (SolarModel.jl:44-51)."""
    lam = np.asarray(lam_grid_um, dtype=np.float64)
    return C1_WL / (lam ** 5 * np.expm1(C2_WL / (lam * T)))


def load_solar_spectrum(path: str, nu_grid) -> np.ndarray:
    """Interpolate a two-column [cm^-1, irradiance] solar spectrum file onto
    ``nu_grid``. Accepts .npy / .npz (key 'spectrum') / whitespace text."""
    if path.endswith(".npy"):
        data = np.load(path)
    elif path.endswith(".npz"):
        data = np.load(path)["spectrum"]
    else:
        data = np.loadtxt(path)
    nu, F = data[:, 0], data[:, 1]
    out = np.interp(np.asarray(nu_grid), nu, F)
    lo, hi = nu.min(), nu.max()
    grid = np.asarray(nu_grid)
    if grid.min() < lo or grid.max() > hi:
        raise ValueError(
            f"model grid [{grid.min():.1f}, {grid.max():.1f}] cm^-1 exceeds "
            f"solar spectrum coverage [{lo:.1f}, {hi:.1f}]")
    return out


def add_thermal_emission(model, T_layers=None):
    """Attach a per-layer Planck thermal volume source to every band
    (reference ThermalEmission(T_layers, nu_grid), thermal_emission.jl:104).

    ``T_layers`` defaults to the model's atmospheric temperature profile.
    """
    T = np.asarray(T_layers if T_layers is not None else model.profile.T,
                   dtype=np.float64)
    for band in model.bands:
        B = np.stack([planck_spectrum_wn(t, band.nu_grid) for t in T])
        band.thermal_b = B                      # (Nz, nSpec)
    return model


def set_surface_sif(model, sif_spectrum):
    """Attach an isotropic surface SIF emission spectrum (irradiance units,
    per band or shared; reference SurfaceSIF, surface_sif.jl)."""
    for band in model.bands:
        sif = np.broadcast_to(np.asarray(sif_spectrum, dtype=np.float64),
                              (band.n_spec,)).copy()
        band.sif_spec = sif
    return model
