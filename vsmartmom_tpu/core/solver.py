"""RT driver: the Fourier-azimuth loop around the layer scan.

TPU-native redesign of the reference rt_run
(/root/reference/src/CoreRT/rt_run.jl:238-539):

* the whole solve is one jitted pure function of (SolverInputs, SolverConfig);
* the vertical layer loop is a ``lax.scan`` carrying the composite operators;
* the Fourier moments m = 0..m_max are unrolled inside jit (each has its own
  phase supermatrices) and their azimuthally-weighted contributions are
  accumulated on-device — no per-m host round trips;
* postprocessing (VZA gather + cos/sin(m phi) weights) stays on-device.

Outputs follow the reference convention: ``R`` / ``T`` are the
source-function-integrated radiance factors (I/F0) at TOA (upwelling) and
BOA (downwelling), shape (nVZA, n_stokes, nSpec).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .kernels import (AddedLayer, doubling, elemental, identity_composite,
                      interaction)
from .types import SolverConfig, SolverInputs, stokes_d_vector


def _mixed_omega_Z(scat_w_z, Z_comp, tau_z):
    """omega_lambda * Z_mixed = sum_c w_c Z_c / tau  -> (nSpec, N, N).

    This fuses the reference's optics mixing (types.jl:1262-1292) with the
    expansion to the spectral batch (expandOpticalProperties) — the mixed
    supermatrix is never stored, only materialized inside the layer step.
    """
    num = jnp.einsum("cs,cij->sij", scat_w_z, Z_comp)
    safe_tau = jnp.where(tau_z > 0, tau_z, 1.0)
    return num / safe_tau[:, None, None]


def _layer_step(comp, layer_data, *, Z_pp_m, Z_mp_m, qp_mu_N, wt_mu_N, mu0,
                config: SolverConfig, F0, fourier_w, d_vec):
    """One layer of the vertical scan: elemental -> doubling -> interaction."""
    tau_z, scat_w_z, tau_sum_z = layer_data
    dtau = tau_z / (2 ** config.ndoubl)
    wZ_pp = _mixed_omega_Z(scat_w_z, Z_pp_m, tau_z)
    wZ_mp = _mixed_omega_Z(scat_w_z, Z_mp_m, tau_z)

    r_mp, t_pp, j0_p, j0_m = elemental(
        wZ_pp, wZ_mp, dtau, tau_sum_z, qp_mu_N, wt_mu_N, mu0,
        config.i_mu0_start, config.n_stokes, F0, fourier_w)

    expk = jnp.exp(-dtau / mu0)
    add = doubling(r_mp, t_pp, j0_p, j0_m, expk, config.ndoubl, d_vec)
    return interaction(comp, add), None


def _surface_layer(inputs: SolverInputs, config: SolverConfig, m: int,
                   tau_sum_boa, dtype) -> AddedLayer:
    """Surface as an AddedLayer (reference Surfaces/*.jl create_surface_layer!).

    ``surf_r[m]`` already includes the quadrature factor diag(mu_N * w_N);
    ``surf_j_m[m]`` is mu0 * R_raw[:, solar block] (N, n_stokes). Both get the
    spectral scaling ``surf_spec`` and solar attenuation exp(-tau_sum/mu0).
    """
    n_spec, N = config.n_spec, config.N
    mu0 = inputs.qp_mu_N[config.i_mu0_start].astype(dtype)
    att = jnp.exp(-tau_sum_boa / mu0)                       # (s,)
    spec = inputs.surf_spec.astype(dtype)

    r_mp = (inputs.surf_r[m].astype(dtype)[None] *
            spec[:, None, None] * jnp.ones((n_spec, 1, 1), dtype))
    eye = jnp.broadcast_to(jnp.eye(N, dtype=dtype), (n_spec, N, N))
    zero_m = jnp.zeros((n_spec, N, N), dtype)

    F0 = inputs.F0.astype(dtype)                            # (ns, s)
    # Direct beam reaching BOA, placed on the solar stream block.
    j0_p = jnp.zeros((n_spec, N), dtype)
    j0_p = j0_p.at[:, config.i_mu0_start:config.i_mu0_start + config.n_stokes].set(
        (F0 * att[None, :]).T)
    # Surface-reflected upwelling source.
    j0_m = jnp.einsum("ik,ks->si", inputs.surf_j_m[m].astype(dtype), F0) \
        * (att * spec)[:, None]
    return AddedLayer(r_mp, zero_m, eye, eye, j0_p, j0_m)


@partial(jax.jit, static_argnames=("config",))
def rt_solve(inputs: SolverInputs, config: SolverConfig):
    """Full multi-moment solve. Returns dict with R, T (nVZA, n_stokes, nSpec)
    plus the BOA downwelling/TOA upwelling stream vectors of the m = 0 moment
    (for flux diagnostics)."""
    dtype = jnp.dtype(config.dtype)
    n_spec, N, nz = config.n_spec, config.N, config.nz
    ns = config.n_stokes

    qp_mu_N = inputs.qp_mu_N.astype(dtype)
    wt_mu_N = inputs.wt_mu_N.astype(dtype)
    mu0 = qp_mu_N[config.i_mu0_start]
    d_vec = jnp.asarray(stokes_d_vector(ns, config.nquad), dtype)

    tau = inputs.tau.astype(dtype)            # (Nz, s)
    scat_w = inputs.scat_w.astype(dtype)      # (Nz, C, s)
    F0 = inputs.F0.astype(dtype)

    # Cumulative optical depth above each layer (extractEffectiveProps,
    # compEffectiveLayerProperties.jl:84-91) — one cumsum, on-device.
    tau_sum = jnp.concatenate(
        [jnp.zeros((1, n_spec), dtype), jnp.cumsum(tau, axis=0)], axis=0)

    nvza = len(config.vza_idx)
    R = jnp.zeros((nvza, ns, n_spec), dtype)
    T = jnp.zeros((nvza, ns, n_spec), dtype)
    flux_diag = None

    vza_rows = np.asarray(
        [[v * ns + k for k in range(ns)] for v in config.vza_idx])  # (nvza, ns)

    for m in range(config.m_max + 1):
        fourier_w = 0.5 if m == 0 else 0.25
        Z_pp_m = inputs.Z_pp[m].astype(dtype)
        Z_mp_m = inputs.Z_mp[m].astype(dtype)

        step = partial(_layer_step, Z_pp_m=Z_pp_m, Z_mp_m=Z_mp_m,
                       qp_mu_N=qp_mu_N, wt_mu_N=wt_mu_N, mu0=mu0,
                       config=config, F0=F0, fourier_w=fourier_w, d_vec=d_vec)

        comp = identity_composite(n_spec, N, dtype)
        comp, _ = jax.lax.scan(step, comp, (tau, scat_w, tau_sum[:nz]))

        surf = _surface_layer(inputs, config, m, tau_sum[nz], dtype)
        comp = interaction(comp, surf)

        # Azimuthal weighting (postprocessing_vza.jl:50-94), on-device:
        # R += w * J0-(rows), T += w * J0+(rows).
        Jm_rows = comp.J0_m[:, vza_rows]     # (s, nvza, ns)
        Jp_rows = comp.J0_p[:, vza_rows]
        w = inputs.vza_w[m].astype(dtype)    # (nvza, ns)
        R = R + jnp.transpose(Jm_rows, (1, 2, 0)) * w[:, :, None]
        T = T + jnp.transpose(Jp_rows, (1, 2, 0)) * w[:, :, None]

        if m == 0:
            flux_diag = {"J0_up_toa": comp.J0_m, "J0_dn_boa": comp.J0_p}

    return {"R": R, "T": T, **flux_diag}


def rt_run(model):
    """User-facing forward run on an RTModel (reference rt_run.jl:53).

    Returns (R, T) with shape (nVZA, n_stokes, nSpec_total) concatenated over
    bands, as radiance factors I/F0 (SFI outputs of the reference).
    """
    Rs, Ts = [], []
    for inputs, config in model.band_solver_args():
        out = rt_solve(inputs, config)
        Rs.append(np.asarray(out["R"]))
        Ts.append(np.asarray(out["T"]))
    return np.concatenate(Rs, axis=-1), np.concatenate(Ts, axis=-1)
