"""Multi-sensor RT: up/downwelling radiances at arbitrary sensor levels.

Behavioral reference: /root/reference/src/CoreRT/rt_run_multisensor.jl
(rt_run_test_ms, l.14-184), CoreKernel/rt_kernel_multisensor.jl (top/bot
composite maintenance) and CoreKernel/interlayer_flux.jl
(interlayer_flux_helper!, the two-stack coupling solve).

A sensor level L in [0, Nz] is the interface below layer L (0 = TOA,
Nz = BOA, intermediate = airborne/balloon/tower). For each sensor the
column splits into a *top* stack (layers 1..L) and a *bot* stack
(layers L+1..Nz plus the surface), and the radiation field at the
interface follows from the two-stack coupling:

    dwJ = (I - topR+- botR-+)^-1 (topJ0+ + topR+- botJ0-)
    uwJ = (I - botR-+ topR+-)^-1 (botJ0- + botR-+ topJ0+)

TPU design: one vertical scan per Fourier moment *stashes* the per-layer
added operators; per sensor, a forward adding scan builds the top stack
and a reverse *prepend* scan builds the bot stack (the adding equations
are symmetric two-stack compositions, so prepending reuses the same
interaction kernel with the container roles swapped). Everything stays
on device inside one jitted multi-moment scan.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .kernels import (AddedLayer, CompositeLayer, _bmm, _bmv, _bsolve,
                      identity_composite, interaction)
from .solver import _make_added_layer, _surface_layer
from .types import SolverConfig, SolverInputs, stokes_d_vector


def interaction_prepend(add: AddedLayer, comp: CompositeLayer
                        ) -> CompositeLayer:
    """Compose ``add`` (above) with ``comp`` (below). The adding equations
    are the generic two-stack composition, so this is interaction() with
    the upper/lower container roles swapped."""
    upper = CompositeLayer(add.r_mp, add.r_pm, add.t_pp, add.t_mm,
                           add.j0_p, add.j0_m)
    lower = AddedLayer(comp.R_mp, comp.R_pm, comp.T_pp, comp.T_mm,
                       comp.J0_p, comp.J0_m)
    return interaction(upper, lower)


def _composite_from_added(add: AddedLayer) -> CompositeLayer:
    return CompositeLayer(add.r_mp, add.r_pm, add.t_pp, add.t_mm,
                          add.j0_p, add.j0_m)


def interlayer_flux(top: CompositeLayer, bot: CompositeLayer):
    """(dwJ, uwJ) stream vectors (s, N, K) at the top/bot interface
    (interlayer_flux_helper!, interlayer_flux.jl:185-202)."""
    N = top.T_pp.shape[-1]
    eye_b = jnp.broadcast_to(jnp.eye(N, dtype=top.T_pp.dtype),
                             top.T_pp.shape)
    inv1 = _bsolve(eye_b - _bmm(top.R_pm, bot.R_mp), eye_b)
    dwJ = _bmv(inv1, top.J0_p + _bmv(top.R_pm, bot.J0_m))
    inv2 = _bsolve(eye_b - _bmm(bot.R_mp, top.R_pm), eye_b)
    uwJ = _bmv(inv2, bot.J0_m + _bmv(bot.R_mp, top.J0_p))
    return dwJ, uwJ


def _tree_slice(tree, lo, hi):
    return jax.tree_util.tree_map(lambda x: x[lo:hi], tree)


def _tree_reverse(tree):
    return jax.tree_util.tree_map(lambda x: x[::-1], tree)


@partial(jax.jit, static_argnames=("config", "sensor_levels"))
def rt_solve_ms(inputs: SolverInputs, config: SolverConfig,
                sensor_levels: tuple):
    """Multi-sensor solve. Returns dict with uwJ/dwJ, each
    (n_sensors, nVZA, nStokes, nSpec): upwelling/downwelling radiance at
    each sensor level (rt_run_test_ms, rt_run_multisensor.jl:14-184).

    Conventions mirror the reference: for sensor level 0 (TOA) the reported
    pair is (TOA upwelling, BOA downwelling) — identical to rt_run's (R, T)
    (postprocessing_vza_ms.jl:31-41)."""
    dtype = jnp.dtype(config.dtype)
    n_spec, N, nz = config.n_spec, config.N, config.nz
    ns = config.n_stokes

    qp_mu_N = inputs.qp_mu_N.astype(dtype)
    wt_mu_N = inputs.wt_mu_N.astype(dtype)
    mu0 = qp_mu_N[config.i_mu0_start]
    d_vec = jnp.asarray(stokes_d_vector(ns, config.nquad), dtype)

    tau = inputs.tau.astype(dtype)
    scat_w = inputs.scat_w.astype(dtype)
    F0 = inputs.F0.astype(dtype)
    surf_spec = inputs.surf_spec.astype(dtype)
    thermal_b = inputs.thermal_b.astype(dtype)
    sif_spec = inputs.sif_spec.astype(dtype)

    tau_sum = jnp.concatenate(
        [jnp.zeros((1, n_spec), dtype), jnp.cumsum(tau, axis=0)], axis=0)

    nvza = len(config.vza_idx)
    vza_rows = np.asarray(
        [[v * ns + k for k in range(ns)] for v in config.vza_idx])
    n_m = config.m_max + 1
    fourier_w = jnp.asarray([0.5] + [0.25] * (n_m - 1), dtype)
    n_sens = len(sensor_levels)

    def moment_body(carry, xs):
        uwJ, dwJ = carry
        (Z_pp_m, Z_mp_m, surf_r_m, surf_j_m, direct_m, vza_w_m, fw,
         is_m0) = xs

        kw = dict(Z_pp_m=Z_pp_m, Z_mp_m=Z_mp_m, qp_mu_N=qp_mu_N,
                  wt_mu_N=wt_mu_N, mu0=mu0, config=config, F0=F0,
                  fourier_w=fw, is_m0=is_m0, d_vec=d_vec)

        # Stash all per-layer added operators in one scan.
        def stash_step(_, layer_data):
            return None, _make_added_layer(layer_data, **kw)

        _, adds = jax.lax.scan(
            stash_step, None, (tau, scat_w, tau_sum[:nz], thermal_b))

        surf = _surface_layer(surf_r_m, surf_j_m, direct_m, surf_spec, F0,
                              tau_sum[nz], mu0, sif_spec, is_m0, config,
                              dtype)

        def fwd_step(comp, add_leaves):
            return interaction(comp, AddedLayer(*add_leaves)), None

        def rev_step(comp, add_leaves):
            return interaction_prepend(AddedLayer(*add_leaves), comp), None

        for i_s, L in enumerate(sensor_levels):
            top = identity_composite(n_spec, N, dtype, config.n_sources)
            if L > 0:
                top, _ = jax.lax.scan(fwd_step, top,
                                      tuple(_tree_slice(adds, 0, L)))
            bot = _composite_from_added(surf)
            if L < nz:
                rev = _tree_reverse(_tree_slice(adds, L, nz))
                bot, _ = jax.lax.scan(rev_step, bot, tuple(rev))

            if L == 0:
                # TOA: report (TOA up, BOA down) like rt_run — include the
                # surface interaction via the full column composite
                # (postprocessing_vza_ms.jl:32-34).
                uw_s = bot.J0_m.sum(axis=-1)
                dw_s = bot.J0_p.sum(axis=-1)
            else:
                dw, uw = interlayer_flux(top, bot)
                uw_s = uw.sum(axis=-1)
                dw_s = dw.sum(axis=-1)

            w3 = vza_w_m[:, :, None]
            uwJ = uwJ.at[i_s].add(
                jnp.transpose(uw_s[:, vza_rows], (1, 2, 0)) * w3)
            dwJ = dwJ.at[i_s].add(
                jnp.transpose(dw_s[:, vza_rows], (1, 2, 0)) * w3)
        return (uwJ, dwJ), None

    z0 = jnp.zeros((n_sens, nvza, ns, n_spec), dtype)
    xs = (inputs.Z_pp.astype(dtype), inputs.Z_mp.astype(dtype),
          inputs.surf_r.astype(dtype), inputs.surf_j_m.astype(dtype),
          inputs.surf_direct_m.astype(dtype), inputs.vza_w.astype(dtype),
          fourier_w, jnp.arange(n_m) == 0)
    (uwJ, dwJ), _ = jax.lax.scan(moment_body, (z0, z0), xs)
    return {"uwJ": uwJ, "dwJ": dwJ}


def rt_run_ms(model, sensor_levels, i_band: int = 0):
    """User-facing multi-sensor run (reference rt_run_test_ms).

    sensor_levels: iterable of ints in [0, Nz] — the number of layers above
    each sensor (0 = TOA, Nz = BOA). Returns (uwJ, dwJ), each
    (n_sensors, nVZA, nStokes, nSpec).
    """
    inputs, config = model.build_band(i_band)
    nz = config.nz
    levels = tuple(int(v) for v in sensor_levels)
    for v in levels:
        if not (0 <= v <= nz):
            raise ValueError(f"sensor level {v} outside [0, {nz}]")
    out = rt_solve_ms(inputs, config, levels)
    return np.asarray(out["uwJ"]), np.asarray(out["dwJ"])
