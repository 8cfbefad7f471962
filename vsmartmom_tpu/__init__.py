"""vsmartmom_tpu — a TPU-native (JAX/XLA/Pallas) vector radiative-transfer engine.

A from-scratch reimplementation of the capabilities of
RemoteSensingTools/vSmartMOM.jl (the reference, v2.1.0) designed TPU-first:

* Every RT operator is a batch-leading array ``(nSpec, N, N)`` with
  ``N = Nquad * nStokes``; the whole adding-doubling solver is a chain of
  batched small-matrix multiplies and solves that XLA tiles onto the MXU.
* The layer loop is a ``lax.scan``; the Fourier-azimuth loop is unrolled or
  vmapped; postprocessing stays on-device.
* Spectral points are embarrassingly parallel: the production path shards
  ``nSpec`` over a ``jax.sharding.Mesh(('spectral',))``.
* Setup physics (quadrature, Greek coefficients, generalized spherical
  functions, molecular Raman constants, Mie) runs on host in float64 NumPy,
  mirroring the reference's CPU/f64 model-build stage.

Layer map (reference SURVEY.md section 1):
  io/         YAML config parsing (L7)
  core/model  parameters -> RTModel build (L6)
  absorption/ scattering/ inelastic/  physics inputs (L5)
  core/solver RT driver: Fourier loop x layer scan (L4)
  core/{elemental,doubling,interaction}  per-layer kernels (L3)
  ops/        batched linear algebra + Pallas kernels (L2)
  parallel/   device mesh / sharding (L1-equivalent; XLA owns devices)
"""

import jax

# The reference defaults to Float64 end-to-end (CoreRT/types.jl:770 float_type).
# We enable x64 so parity configs can run in f64; the TPU production path
# selects f32 via RTModel's float dtype.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the Pallas band kernel costs O(30-60 s) to
# compile per shape (more on a congested AOT helper); cache survives across
# processes. Opt out with VSM_NO_COMPILE_CACHE=1 or retarget VSM_CACHE_DIR.
import os as _os  # noqa: E402

if not _os.environ.get("VSM_NO_COMPILE_CACHE"):
    _cache = _os.environ.get(
        "VSM_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "vsmartmom_tpu",
                      "xla"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass    # cache is best-effort; never block import

__version__ = "0.1.0"

from .core.model import model_from_parameters  # noqa: E402,F401
from .core.solver import rt_run  # noqa: E402,F401
from .io.yaml_input import (parameters_from_yaml, parameters_from_dict,  # noqa: E402,F401
                            parameters_from_file, parameters_from_toml)  # noqa: E402,F401
