"""Minimal NetCDF reading without a netCDF4 binding.

The reference uses NCDatasets.jl (src/Aerosols/readers.jl, schemes/*.jl);
this environment has no netCDF4 Python binding, so we read NetCDF-3
(classic) through scipy and NetCDF-4 (HDF5) through h5py.
"""

import numpy as np


class NCFile:
    """Uniform variable access over scipy (NetCDF-3) or h5py (NetCDF-4)."""

    def __init__(self, path: str):
        self.path = path
        self._h5 = None
        self._sp = None
        try:
            from scipy.io import netcdf_file
            self._sp = netcdf_file(path, "r", mmap=False)
        except Exception:
            import h5py
            self._h5 = h5py.File(path, "r")

    def close(self):
        if self._sp is not None:
            self._sp.close()
        if self._h5 is not None:
            self._h5.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def variables(self):
        if self._sp is not None:
            return list(self._sp.variables)
        out = []
        self._h5.visit(lambda name: out.append(name))
        return [n for n in out if hasattr(self._h5[n], "shape")]

    def __contains__(self, name):
        return name in self.variables()

    def read(self, name):
        if self._sp is not None:
            return np.asarray(self._sp.variables[name][...])
        return np.asarray(self._h5[name][...])

    def attrs(self):
        if self._sp is not None:
            return {k: v for k, v in self._sp._attributes.items()}
        return dict(self._h5.attrs)


def horizontal_mean_profile(arr: np.ndarray, lev_axis: int = -2) -> np.ndarray:
    """Average a GEOS-Chem field over its horizontal (and face) dimensions,
    keeping the level axis, taking time step 0 (readers in
    schemes/tomas15.jl:101-112 average dims (1,2,3) of
    (nf, Xdim, Ydim, lev, time) fields)."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 1:
        return a
    # Conventionally (..., lev, time): take time 0, then mean over all
    # leading dims except lev.
    a = a[..., 0] if a.ndim >= 2 else a
    while a.ndim > 1:
        a = a.mean(axis=0)
    return a
