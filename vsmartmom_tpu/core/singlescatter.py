"""Truncated-MOM single-scatter driver (reference rt_run_ss,
/root/reference/src/CoreRT/rt_run.jl:574-755 + CoreKernel/rt_kernel_ss.jl,
interaction_ss.jl).

Physics: the exact finite-dtau elemental operators (Fell 1997) evaluated at
the FULL layer optical depth already are the exact single-scatter layer
operators — no doubling ladder.  The composite carry degenerates to the
two source vectors with explicit Beer-law path attenuation:

    J0+ <- J0+ * exp(-tau_layer / mu_i) + j0+          (downwelling)
    J0- <- J0- + j0- * exp(-tau_above / mu_i)          (upwelling)

(interaction_ss.jl:14-18).  TPU-native form: one lax.scan over layers
carrying only (s, N) vectors inside the jitted Fourier scan; hemispherical
m = 0 integrals hem_R/hem_T accumulate on-device (rt_run.jl:737-748).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .kernels import _exp, elemental
from .solver import _mixed_omega_Z, _surface_layer
from .types import SolverConfig, SolverInputs


@partial(jax.jit, static_argnames=("config",))
def rt_solve_ss(inputs: SolverInputs, config: SolverConfig):
    """Single-scatter-only solve. Returns dict with R, T
    (nVZA, n_stokes, nSpec) and hem_R, hem_T (nSpec,)."""
    dtype = jnp.dtype(config.dtype)
    n_spec, N, nz = config.n_spec, config.N, config.nz
    ns = config.n_stokes

    qp_mu_N = inputs.qp_mu_N.astype(dtype)
    wt_mu_N = inputs.wt_mu_N.astype(dtype)
    mu0 = qp_mu_N[config.i_mu0_start]

    tau = inputs.tau.astype(dtype)            # (Nz, s)
    scat_w = inputs.scat_w.astype(dtype)      # (Nz, C, s)
    F0 = inputs.F0.astype(dtype)
    surf_spec = inputs.surf_spec.astype(dtype)
    sif_spec = inputs.sif_spec.astype(dtype)

    tau_sum = jnp.concatenate(
        [jnp.zeros((1, n_spec), dtype), jnp.cumsum(tau, axis=0)], axis=0)

    nvza = len(config.vza_idx)
    vza_rows = np.asarray(
        [[v * ns + k for k in range(ns)] for v in config.vza_idx])

    n_m = config.m_max + 1
    fourier_w = jnp.asarray([0.5] + [0.25] * (n_m - 1), dtype)

    i_I = (jnp.arange(N) % ns) == 0
    wq_I = wt_mu_N * qp_mu_N * i_I                 # weighted-I-row mask

    def moment_body(carry, xs):
        R, T, hem_R, hem_T = carry
        (Z_pp_m, Z_mp_m, surf_r_m, surf_j_m, direct_m, vza_w_m, fw,
         is_m0) = xs

        def layer_step(carry_J, layer):
            J0_p, J0_m = carry_J
            tau_z, scat_w_z, tau_sum_z = layer
            wZ_pp = _mixed_omega_Z(scat_w_z, Z_pp_m, tau_z)
            wZ_mp = _mixed_omega_Z(scat_w_z, Z_mp_m, tau_z)
            # exact SS layer = elemental at the FULL layer tau (no doubling)
            _, _, j0_p, j0_m = elemental(
                wZ_pp, wZ_mp, tau_z, tau_sum_z, qp_mu_N, wt_mu_N, mu0,
                config.i_mu0_start, config.n_stokes, F0, fw)
            att_dn = _exp(-tau_z[:, None] / qp_mu_N[None, :])       # (s, N)
            att_up = _exp(-tau_sum_z[:, None] / qp_mu_N[None, :])
            J0_p = J0_p * att_dn + j0_p
            J0_m = J0_m + j0_m * att_up
            return (J0_p, J0_m), None

        zeros = jnp.zeros((n_spec, N), dtype)
        (J0_p, J0_m), _ = jax.lax.scan(
            layer_step, (zeros, zeros), (tau, scat_w, tau_sum[:nz]))

        # Surface: j vectors only; upwelling surface source attenuated
        # through the whole column (interaction_ss with tau_surf = 0).
        surf = _surface_layer(surf_r_m, surf_j_m, direct_m, surf_spec, F0,
                              tau_sum[nz], mu0, sif_spec, is_m0, config,
                              dtype)
        att_boa = _exp(-tau_sum[nz][:, None] / qp_mu_N[None, :])
        J0_p = J0_p + surf.j0_p.sum(axis=-1)
        J0_m = J0_m + surf.j0_m.sum(axis=-1) * att_boa

        R = R + jnp.transpose(J0_m[:, vza_rows], (1, 2, 0)) \
            * vza_w_m[:, :, None]
        T = T + jnp.transpose(J0_p[:, vza_rows], (1, 2, 0)) \
            * vza_w_m[:, :, None]

        # m = 0 hemispherical integrals over weighted streams
        # (rt_run.jl:737-748: raw sum, the (0.5/pi) x 2pi weight cancels).
        hem_R = hem_R + is_m0.astype(dtype) * jnp.sum(
            J0_m * wq_I[None, :], axis=1)
        hem_T = hem_T + is_m0.astype(dtype) * jnp.sum(
            J0_p * wq_I[None, :], axis=1)
        return (R, T, hem_R, hem_T), None

    init = (jnp.zeros((nvza, ns, n_spec), dtype),
            jnp.zeros((nvza, ns, n_spec), dtype),
            jnp.zeros((n_spec,), dtype),
            jnp.zeros((n_spec,), dtype))
    xs = (inputs.Z_pp.astype(dtype), inputs.Z_mp.astype(dtype),
          inputs.surf_r.astype(dtype), inputs.surf_j_m.astype(dtype),
          inputs.surf_direct_m.astype(dtype), inputs.vza_w.astype(dtype),
          fourier_w, jnp.arange(n_m) == 0)
    (R, T, hem_R, hem_T), _ = jax.lax.scan(moment_body, init, xs)
    return {"R": R, "T": T, "hem_R": hem_R, "hem_T": hem_T}


def rt_run_ss(model, i_band: int = 0):
    """User-facing single-scatter run (reference rt_run_ss, rt_run.jl:574).

    Returns dict with R, T (nVZA, n_stokes, nSpec) and the m = 0
    hemispherical integrals hem_R, hem_T (nSpec,)."""
    inputs, config = model.build_band(i_band)
    out = rt_solve_ss(inputs, config)
    return {k: np.asarray(v) for k, v in out.items()}
