"""Solver configuration and device-input containers.

The TPU-native redesign of the reference's RTModel/AddedLayer/CompositeLayer
(/root/reference/src/CoreRT/types.jl): instead of mutable preallocated device
buffers, the solver is a pure function of

* ``SolverConfig`` — static, hashable compile-time facts (shapes, loop trip
  counts, stream indices), and
* ``SolverInputs`` — a pytree of arrays, batch-leading ``(nSpec, ...)``,
  sharded over the spectral mesh axis in production.

Operator layout: every RT operator is ``(nSpec, N, N)`` with
``N = Nquad * n_stokes``; source vectors are ``(nSpec, N)``. The reference's
``(N, N, nSpec)`` layout is transposed so the batch axis leads (XLA-friendly
batched GEMM; MXU tiles the trailing two axes).
"""

from dataclasses import dataclass
from typing import Any

import jax
import numpy as np


@dataclass(frozen=True)
class SolverConfig:
    """Static solver facts; hashable so it can be a jit static argument."""

    n_stokes: int        # Stokes components (1, 2, 3, 4)
    nquad: int           # quadrature nodes (incl. zero-weight outputs)
    n_spec: int          # spectral points
    nz: int              # atmospheric layers (TOA -> BOA)
    m_max: int           # Fourier loop runs m = 0 .. m_max (inclusive)
    ndoubl: int          # uniform doubling count per layer
    i_mu0: int           # solar stream node index (0-based)
    vza_idx: tuple       # per-VZA nearest stream node index (0-based)
    dtype: Any           # solver dtype (np.float32 / np.float64)
    n_sources: int = 1   # stacked source slots (1 = solar; 2 = +thermal)
    save_streams: bool = False   # emit per-moment stream vectors (rt_run_streams)
    fused: bool = False  # Pallas fused layer path (ops/fused_rt.py, TPU only)
    pack: int = 1        # block-diagonal spectral pack factor (ops/packing.py)
    ns_sched: tuple = () # per-doubling-step Newton-Schulz iteration counts
                         # (() = worst-case default; see ops/ns_schedule.py)
    ns_inter: int = 6    # NS iterations for the interaction inverse
    m_scat: int = -1     # highest Fourier moment with atmospheric scattering
                         # (< 0: all moments run the full layer chain).
                         # Moments above it use the exact diagonal Beer-law
                         # shortcut (reference ScatteringInterface_00 traits,
                         # types.jl:424-435, done as a static split).
    band_block: int = 16
                         # Spectral block (packed points per Pallas program)
                         # for the band kernel. 16 is the measured best
                         # runtime/compile balance; rt_run_lin drops to 8 —
                         # the auto-derived tangent kernel's Mosaic compile
                         # scales ~4x faster there (752 s -> ~3 min).
    dot_mode: str = "highest"
                         # In-kernel (Pallas) matmul precision for the fused
                         # doubling/interaction ladder:
                         #   "highest" — Mosaic exact-f32 dots (6 bf16 MXU
                         #     passes; the reference's F32 BLAS equivalent);
                         #   "split3"  — manual 3-pass bf16 hi/lo splitting
                         #     (ops/fused_rt._bmm): ~2e-5 per-dot rel err,
                         #     measured ~1.6x faster end-to-end (PERF.md r4).
                         #     Mosaic rejects precision=HIGH, so XLA's 3-pass
                         #     mode is re-derived by hand here;
                         #   "default" — single bf16 pass (~4e-3/dot): fails
                         #     the parity gate, measurement-only.

    @property
    def N(self) -> int:
        return self.nquad * self.n_stokes

    @property
    def i_mu0_start(self) -> int:
        return self.i_mu0 * self.n_stokes


@jax.tree_util.register_pytree_node_class
@dataclass
class SolverInputs:
    """Device arrays consumed by the jitted solver (one band).

    Shapes (N = nquad * n_stokes, C = number of scattering components,
    M = m_max + 1 Fourier moments):

      qp_mu_N     (N,)              stream cosines, Stokes-expanded
      wt_mu_N     (N,)              stream weights, Stokes-expanded
      tau         (Nz, nSpec)       total layer optical depth
      scat_w      (Nz, C, nSpec)    per-component scattering weight tau_c*pi_c
      Z_pp, Z_mp  (M, C, N, N)      per-moment per-component phase supermatrices
      F0          (n_stokes, nSpec) solar irradiance Stokes vector
      surf_r      (M, N, N)         surface reflection operator (x mu*w quad)
      surf_j_m    (M, N, n_stokes)  surface upwelling source seed (x solar att.)
      surf_spec   (nSpec,)          spectral scaling of the surface reflection
      surf_direct_m (M,)            per-moment direct-beam mask for surface j0+
      vza_w       (M, nVZA, n_stokes) postprocessing Fourier-azimuth weights
      thermal_b   (Nz, nSpec)       per-layer Planck radiance (thermal source)
      sif_spec    (nSpec,)          surface SIF emission spectrum (irradiance)
    """

    qp_mu_N: Any
    wt_mu_N: Any
    tau: Any
    scat_w: Any
    Z_pp: Any
    Z_mp: Any
    F0: Any
    surf_r: Any
    surf_j_m: Any
    surf_spec: Any
    surf_direct_m: Any
    vza_w: Any
    thermal_b: Any
    sif_spec: Any

    _fields = ("qp_mu_N", "wt_mu_N", "tau", "scat_w", "Z_pp", "Z_mp", "F0",
               "surf_r", "surf_j_m", "surf_spec", "surf_direct_m", "vza_w",
               "thermal_b", "sif_spec")

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._fields), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def mu0_value(inputs: SolverInputs, config: SolverConfig):
    """Solar cosine as stored on the stream vector (exact node value)."""
    return inputs.qp_mu_N[config.i_mu0_start]


def stokes_d_vector(n_stokes: int, nquad: int, dtype=np.float64) -> np.ndarray:
    """The D-matrix diagonal tiled over streams (types.jl D = [1,1,-1,-1])."""
    d = np.ones(n_stokes)
    if n_stokes >= 3:
        d[2:] = -1.0
    return np.tile(d, nquad).astype(dtype)
