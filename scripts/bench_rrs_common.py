"""Shared scene builder for the RRS probes/benches."""
import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from vsmartmom_tpu import model_from_parameters  # noqa: E402
from vsmartmom_tpu.core.inelastic import (inelastic_setup,  # noqa: E402
                                          rt_solve_rrs)
from vsmartmom_tpu.core.model import (Parameters,  # noqa: E402
                                      SurfaceDescriptor)
from vsmartmom_tpu.scattering.stokes import STOKES_IQU  # noqa: E402


def build(n_spec):
    nu = 12950.0 + 0.6 * np.arange(n_spec)
    params = Parameters(
        spec_bands=[nu],
        surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [0.05])],
        nstreams=8, polarization=STOKES_IQU,
        sza=45.0, vza=[0.0, 30.0, 60.0], vaz=[0.0, 0.0, 0.0], obs_alt=0.0,
        T=np.linspace(230.0, 290.0, 8),
        p=np.linspace(50.0, 1013.0, 9),
        depol=-1.0, float_type=np.float32)
    model = model_from_parameters(params)
    model.bands[0].sif_spec = 1e-3 * np.ones(n_spec)
    (inputs, config, shifts, w_shifts, Z_r_pp, Z_r_mp, fscatt,
     src_fn) = inelastic_setup(model)
    fn = jax.jit(lambda i: rt_solve_rrs(i, config, shifts, w_shifts,
                                        Z_r_pp, Z_r_mp, fscatt,
                                        src_fn=src_fn))
    return fn, inputs
