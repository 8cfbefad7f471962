"""HITRAN line-list parsing, isotopologue metadata, and TIPS partition sums.

Behavioral reference: /root/reference/src/Absorption/
{read_hitran.jl, constants/mol_weights.jl, constants/TIPS_2017.jl}.

Bundled data (public datasets, identical files to the reference's artifacts):
  data/iso_info.nc   — HITRAN isotopologue metadata (ids, masses, abundances)
  data/TIPS_2017.nc  — TIPS-2017 total internal partition sums Q(T)
"""

import os
from dataclasses import dataclass
from functools import lru_cache

import h5py
import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

# HITRAN 160-character .par record layout (read_hitran.jl:40-44)
_PAR_FIELDS = [
    ("mol", 2, int), ("iso", 1, int), ("nu", 12, float), ("sw", 10, float),
    ("a", 10, float), ("gamma_air", 5, float), ("gamma_self", 5, float),
    ("elower", 10, float), ("n_air", 4, float), ("delta_air", 8, float),
    ("global_upper_quanta", 15, str), ("global_lower_quanta", 15, str),
    ("local_upper_quanta", 15, str), ("local_lower_quanta", 15, str),
    ("ierr", 6, str), ("iref", 12, str), ("line_mixing_flag", 1, str),
    ("gp", 7, float), ("gpp", 7, float),
]


@dataclass
class HitranTable:
    """Column-vector line list (reference Absorption/types.jl:24-63)."""
    mol: np.ndarray
    iso: np.ndarray
    nu: np.ndarray          # line position [cm^-1]
    sw: np.ndarray          # intensity at 296 K [cm^-1/(molec cm^-2)]
    gamma_air: np.ndarray   # air-broadened HWHM [cm^-1/atm]
    gamma_self: np.ndarray
    e_lower: np.ndarray     # lower-state energy [cm^-1]
    n_air: np.ndarray       # T exponent of gamma_air
    delta_air: np.ndarray   # pressure shift [cm^-1/atm]

    def __len__(self):
        return len(self.nu)


def read_hitran(path: str, mol: int = -1, iso: int = -1,
                nu_min: float = 0.0, nu_max: float = np.inf,
                min_strength: float = 0.0) -> HitranTable:
    """Parse a fixed-width HITRAN .par file with optional filters."""
    cols = {name: [] for name, _, _ in _PAR_FIELDS[:10]}
    starts = np.cumsum([0] + [w for _, w, _ in _PAR_FIELDS])
    with open(path) as f:
        for line in f:
            try:
                m = int(line[0:2])
                i = int(line[2:3])
                nu = float(line[3:15])
                s = float(line[15:25])
            except ValueError:
                continue
            if mol != -1 and m != mol:
                continue
            if iso != -1 and i != iso:
                continue
            if not (nu_min <= nu <= nu_max) or s < min_strength:
                continue
            vals = [m, i, nu, s]
            for k in range(4, 10):
                name, _, typ = _PAR_FIELDS[k]
                raw = line[starts[k]:starts[k + 1]]
                try:
                    vals.append(typ(raw))
                except ValueError:
                    vals.append(typ(0))
            for (name, _, _), v in zip(_PAR_FIELDS[:10], vals):
                cols[name].append(v)
    if not cols["nu"]:
        raise ValueError(f"No HITRAN lines matched filters in {path}")
    return HitranTable(
        mol=np.asarray(cols["mol"], dtype=np.int32),
        iso=np.asarray(cols["iso"], dtype=np.int32),
        nu=np.asarray(cols["nu"]),
        sw=np.asarray(cols["sw"]),
        gamma_air=np.asarray(cols["gamma_air"]),
        gamma_self=np.asarray(cols["gamma_self"]),
        e_lower=np.asarray(cols["elower"]),
        n_air=np.asarray(cols["n_air"]),
        delta_air=np.asarray(cols["delta_air"]))


@lru_cache(maxsize=1)
def _iso_info():
    with h5py.File(os.path.join(_DATA_DIR, "iso_info.nc"), "r") as f:
        return {k: f[k][()] for k in
                ("molecule", "isotope", "mol_weight", "abundance", "mol_name")}


def mol_weight(mol: int, iso: int) -> float:
    """Molar mass [kg/mol] for HITRAN (molecule, isotopologue) ids."""
    w = _iso_info()["mol_weight"][iso - 1, mol - 1]
    if w < 0:
        raise KeyError(f"no isotopologue (mol={mol}, iso={iso})")
    return float(w)


def mol_number(name: str) -> int:
    """HITRAN molecule id from name (e.g. 'O2' -> 7)."""
    info = _iso_info()
    names = info["mol_name"]
    for j in range(names.shape[1]):
        n = names[0, j]
        n = n.decode() if isinstance(n, bytes) else str(n)
        if n == name:
            return int(info["molecule"][j])
    raise KeyError(f"unknown molecule {name!r}")


@lru_cache(maxsize=1)
def _tips():
    with h5py.File(os.path.join(_DATA_DIR, "TIPS_2017.nc"), "r") as f:
        return f["TIPS_2017_T"][()], f["TIPS_2017_Q"][()]   # (nT, iso, mol)


@lru_cache(maxsize=512)
def _tips_for(mol: int, iso: int):
    T, Q = _tips()
    t = T[:, iso - 1, mol - 1]
    q = Q[:, iso - 1, mol - 1]
    valid = t != -1
    if not valid.any():
        raise KeyError(f"no TIPS data for (mol={mol}, iso={iso})")
    return t[valid].astype(np.float64), q[valid].astype(np.float64)


def qoft(mol: int, iso: int, T: float, T_ref: float = 296.0) -> float:
    """Partition-sum ratio Q(T_ref)/Q(T) by linear interpolation in the
    TIPS-2017 tables (TIPS_2017.jl qoft!)."""
    tt, qq = _tips_for(mol, iso)
    q_t = np.interp(T, tt, qq)
    q_ref = np.interp(T_ref, tt, qq)
    return float(q_ref / q_t)
