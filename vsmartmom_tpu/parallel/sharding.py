"""Spectral-domain decomposition over a TPU device mesh.

The reference has no distributed backend (SURVEY.md section 2.10); this is
the TPU-native addition: every RT operator is batch-leading over nSpec and
spectral points are embarrassingly parallel through the whole layer-adding
chain, so the production strategy is a 1-D mesh over a ``spectral`` axis
with batch-sharded operators. XLA compiles the solve with zero collectives
in the hot loop; only output gathers (tiny (nVZA, nStokes, nSpec) arrays)
touch the interconnect. The one cross-shard coupling is Raman
redistribution: its spectral rolls compile to a bounded-halo collective
permute on a sharded axis (tests/test_sharding.py proves the sharded RRS
solve matches the unsharded result through that collective).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import SolverInputs

SPECTRAL_AXIS = "spectral"


def spectral_mesh(devices=None) -> Mesh:
    """1-D device mesh over the spectral axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (SPECTRAL_AXIS,))


def pad_to_multiple(n_spec: int, n_dev: int) -> int:
    """Spectral points must tile evenly across devices; callers pad the
    wavenumber grid with replicated tail points."""
    return ((n_spec + n_dev - 1) // n_dev) * n_dev


def input_shardings(mesh: Mesh) -> SolverInputs:
    """PartitionSpecs for every SolverInputs leaf: shard the spectral axis,
    replicate the small angular operators."""
    s = SPECTRAL_AXIS
    return SolverInputs(
        qp_mu_N=NamedSharding(mesh, P()),
        wt_mu_N=NamedSharding(mesh, P()),
        tau=NamedSharding(mesh, P(None, s)),          # (Nz, nSpec)
        scat_w=NamedSharding(mesh, P(None, None, s)),  # (Nz, C, nSpec)
        Z_pp=NamedSharding(mesh, P()),
        Z_mp=NamedSharding(mesh, P()),
        F0=NamedSharding(mesh, P(None, s)),           # (ns, nSpec)
        surf_r=NamedSharding(mesh, P()),
        surf_j_m=NamedSharding(mesh, P()),
        surf_spec=NamedSharding(mesh, P(s)),          # (nSpec,)
        surf_direct_m=NamedSharding(mesh, P()),
        vza_w=NamedSharding(mesh, P()),
        thermal_b=NamedSharding(mesh, P(None, s)),    # (Nz, nSpec)
        sif_spec=NamedSharding(mesh, P(s)),           # (nSpec,)
    )


def shard_inputs(inputs: SolverInputs, mesh: Mesh) -> SolverInputs:
    """Place SolverInputs on the mesh with spectral sharding."""
    shardings = input_shardings(mesh)
    return jax.tree_util.tree_map(jax.device_put, inputs, shardings)
