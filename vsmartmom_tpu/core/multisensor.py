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


# ---------------------------------------------------------------------------
# Multisensor + inelastic (RRS/VS): the reference's CompositeLayerMS(RS)
# variants (types.jl:339-422, rt_kernel_multisensor.jl,
# interaction_multisensor.jl) — both stacks carry their ie-counterparts and
# the interface coupling gets the bichromatic product rule.
# ---------------------------------------------------------------------------

from .inelastic import (IEAdded, IEComposite, ie_elemental,
                        ie_interaction, zero_ie_composite, _roll0,
                        doubling_rs, _comp_dict, _add_dict)
from .kernels import elemental as _elemental
from .kernels import _exp
from .solver import _mixed_omega_Z


def _mv(a, v):
    return jnp.einsum("sij,sj->si", a, v, precision="highest")


def ie_interlayer_flux(top, bot, top_ie: IEComposite, bot_ie: IEComposite,
                       shifts, src_fn=_roll0):
    """(iedwJ, ieuwJ) per shift at the top/bot interface: the bichromatic
    product rule applied to interlayer_flux (interlayer_flux.jl:185-202;
    ie maintenance pattern interaction_multisensor.jl).

        dwJ = G1 u,  G1 = (I - topR+- botR-+)^-1, u = topJ0+ + topR+- botJ0-
        ie(G1) = G1 (ieTopR+- R0(botR-+) + topR+- ieBotR-+) R0(G1)

    Elastic sources here are K-summed (s, N) vectors.
    """
    N = top.T_pp.shape[-1]
    eye_b = jnp.broadcast_to(jnp.eye(N, dtype=top.T_pp.dtype),
                             top.T_pp.shape)
    topJp = top.J0_p.sum(axis=-1)
    botJm = bot.J0_m.sum(axis=-1)
    G1 = _bsolve(eye_b - _bmm(top.R_pm, bot.R_mp), eye_b)
    u1 = topJp + _mv(top.R_pm, botJm)
    G2 = _bsolve(eye_b - _bmm(bot.R_mp, top.R_pm), eye_b)
    u2 = botJm + _mv(bot.R_mp, topJp)

    def per_shift(shift, tRmp, tRpm, tTpp, tTmm, tJp, tJm,
                  bRmp, bRpm, bTpp, bTmm, bJp, bJm):
        R0 = lambda x: src_fn(x, shift)
        ieG1 = _bmm(G1, _bmm(_bmm(tRpm, R0(bot.R_mp)) + _bmm(top.R_pm, bRmp),
                             R0(G1)))
        iedw = _mv(ieG1, R0(u1)) + _mv(G1, tJp + _mv(tRpm, R0(botJm))
                                       + _mv(top.R_pm, bJm))
        ieG2 = _bmm(G2, _bmm(_bmm(bRmp, R0(top.R_pm)) + _bmm(bot.R_mp, tRpm),
                             R0(G2)))
        ieuw = _mv(ieG2, R0(u2)) + _mv(G2, bJm + _mv(bRmp, R0(topJp))
                                       + _mv(bot.R_mp, tJp))
        return iedw, ieuw

    iedw, ieuw = jax.vmap(per_shift)(jnp.asarray(shifts, jnp.int32),
                                     *top_ie, *bot_ie)
    dwJ, uwJ = interlayer_flux(top, bot)
    return dwJ.sum(axis=-1), uwJ.sum(axis=-1), iedw.sum(0), ieuw.sum(0)


@partial(jax.jit,
         static_argnames=("config", "sensor_levels", "shifts", "src_fn"))
def rt_solve_ms_rrs(inputs: SolverInputs, config: SolverConfig,
                    sensor_levels: tuple, shifts, w_shifts, Z_r_pp, Z_r_mp,
                    fscatt, src_fn=_roll0):
    """Multi-sensor solve WITH inelastic (RRS/VS) fields: uwJ/dwJ plus
    ieuwJ/iedwJ at every sensor level, each (n_sensors, nVZA, ns, nSpec).

    Per moment, one vertical scan stashes every layer's (AddedLayer,
    IEAdded); per sensor, the top stack is built by forward ie-adding and
    the bot stack by reverse ie-prepending (the adding equations are
    symmetric two-stack compositions, so the prepend reuses ie_interaction
    with the container roles swapped), then the interface coupling applies
    the bichromatic product rule (ie_interlayer_flux)."""
    dtype = jnp.dtype(config.dtype)
    n_spec, N, nz = config.n_spec, config.N, config.nz
    ns = config.n_stokes
    n_r = len(shifts)
    shifts_arr = jnp.asarray(shifts, jnp.int32)

    qp_mu_N = inputs.qp_mu_N.astype(dtype)
    wt_mu_N = inputs.wt_mu_N.astype(dtype)
    mu0 = qp_mu_N[config.i_mu0_start]
    d_vec = jnp.asarray(stokes_d_vector(ns, config.nquad), dtype)

    tau = inputs.tau.astype(dtype)
    scat_w = inputs.scat_w.astype(dtype)
    F0 = inputs.F0.astype(dtype)
    surf_spec = inputs.surf_spec.astype(dtype)
    fscatt = fscatt.astype(dtype)
    w_shifts = w_shifts.astype(dtype)

    tau_sum = jnp.concatenate(
        [jnp.zeros((1, n_spec), dtype), jnp.cumsum(tau, axis=0)], axis=0)
    nvza = len(config.vza_idx)
    vza_rows = np.asarray(
        [[v * ns + k for k in range(ns)] for v in config.vza_idx])
    n_m = config.m_max + 1
    fourier_w = jnp.asarray([0.5] + [0.25] * (n_m - 1), dtype)
    n_sens = len(sensor_levels)

    def moment_body(carry, xs):
        uwJ, dwJ, ieuwJ, iedwJ = carry
        (Z_pp_m, Z_mp_m, Z_r_pp_m, Z_r_mp_m, surf_r_m, surf_j_m, direct_m,
         vza_w_m, fw, is_m0) = xs

        def stash_step(_, layer_data):
            tau_z, scat_w_z, tau_sum_z, fscatt_z = layer_data
            dtau = tau_z / (2 ** config.ndoubl)
            wZ_pp = _mixed_omega_Z(scat_w_z, Z_pp_m, tau_z)
            wZ_mp = _mixed_omega_Z(scat_w_z, Z_mp_m, tau_z)
            r_mp, t_pp, j_p, j_m = _elemental(
                wZ_pp, wZ_mp, dtau, tau_sum_z, qp_mu_N, wt_mu_N, mu0,
                config.i_mu0_start, ns, F0, fw)
            wct = fw * wt_mu_N
            ie_el = jax.vmap(
                lambda sh, w: ie_elemental(
                    sh, w, fscatt_z, dtau, tau_sum_z, Z_r_pp_m, Z_r_mp_m,
                    qp_mu_N, wct, mu0, config.i_mu0_start, ns, F0, fw,
                    src_fn))(shifts_arr, w_shifts)
            expk = _exp(-dtau / mu0)
            add, add_ie = doubling_rs(r_mp, t_pp, j_p, j_m, expk, ie_el,
                                      config.ndoubl, d_vec, shifts, src_fn)
            return None, (add, add_ie)

        _, (adds, add_ies) = jax.lax.scan(
            stash_step, None, (tau, scat_w, tau_sum[:nz], fscatt))

        sif0 = inputs.sif_spec.astype(dtype)
        surf = _surface_layer(surf_r_m, surf_j_m, direct_m, surf_spec, F0,
                              tau_sum[nz], mu0, sif0, is_m0, config, dtype)

        def fwd_step(carry, leaves):
            comp, comp_ie = carry
            add = AddedLayer(*leaves[:6])
            add_ie = IEAdded(*leaves[6:])
            comp_ie = ie_interaction(_comp_dict(comp), _add_dict(add),
                                     comp_ie, add_ie, shifts, src_fn)
            return (interaction(comp, add), comp_ie), None

        def rev_step(carry, leaves):
            comp, comp_ie = carry
            add = AddedLayer(*leaves[:6])
            add_ie = IEAdded(*leaves[6:])
            # prepend: the layer is ABOVE the accumulated stack — same
            # two-stack composition with the container roles swapped.
            comp_ie = ie_interaction(
                _comp_dict(_composite_from_added(add)),
                _add_dict(AddedLayer(*comp)),
                IEComposite(*add_ie), IEAdded(*comp_ie), shifts, src_fn)
            return (interaction_prepend(add, comp), comp_ie), None

        for i_s, L in enumerate(sensor_levels):
            # the RRS path carries a single (solar) source slot
            top = identity_composite(n_spec, N, dtype, 1)
            top_ie = zero_ie_composite(n_r, n_spec, N, dtype)
            if L > 0:
                (top, top_ie), _ = jax.lax.scan(
                    fwd_step, (top, top_ie),
                    tuple(_tree_slice(adds, 0, L))
                    + tuple(_tree_slice(add_ies, 0, L)))
            bot = _composite_from_added(surf)
            bot_ie = zero_ie_composite(n_r, n_spec, N, dtype)
            if L < nz:
                rev_a = _tree_reverse(_tree_slice(adds, L, nz))
                rev_i = _tree_reverse(_tree_slice(add_ies, L, nz))
                (bot, bot_ie), _ = jax.lax.scan(
                    rev_step, (bot, bot_ie), tuple(rev_a) + tuple(rev_i))

            if L == 0:
                uw_s = bot.J0_m.sum(axis=-1)
                dw_s = bot.J0_p.sum(axis=-1)
                ieuw_s = bot_ie.ieJm.sum(axis=0)
                iedw_s = bot_ie.ieJp.sum(axis=0)
            else:
                dw_s, uw_s, iedw_s, ieuw_s = ie_interlayer_flux(
                    top, bot, top_ie, bot_ie, shifts, src_fn)

            w3 = vza_w_m[:, :, None]
            uwJ = uwJ.at[i_s].add(
                jnp.transpose(uw_s[:, vza_rows], (1, 2, 0)) * w3)
            dwJ = dwJ.at[i_s].add(
                jnp.transpose(dw_s[:, vza_rows], (1, 2, 0)) * w3)
            ieuwJ = ieuwJ.at[i_s].add(
                jnp.transpose(ieuw_s[:, vza_rows], (1, 2, 0)) * w3)
            iedwJ = iedwJ.at[i_s].add(
                jnp.transpose(iedw_s[:, vza_rows], (1, 2, 0)) * w3)
        return (uwJ, dwJ, ieuwJ, iedwJ), None

    z0 = jnp.zeros((n_sens, nvza, ns, n_spec), dtype)
    xs = (inputs.Z_pp.astype(dtype), inputs.Z_mp.astype(dtype),
          Z_r_pp.astype(dtype), Z_r_mp.astype(dtype),
          inputs.surf_r.astype(dtype), inputs.surf_j_m.astype(dtype),
          inputs.surf_direct_m.astype(dtype), inputs.vza_w.astype(dtype),
          fourier_w, jnp.arange(n_m) == 0)
    (uwJ, dwJ, ieuwJ, iedwJ), _ = jax.lax.scan(
        moment_body, (z0, z0, z0, z0), xs)
    return {"uwJ": uwJ, "dwJ": dwJ, "ieuwJ": ieuwJ, "iedwJ": iedwJ}


def rt_run_ms_rrs(model, sensor_levels, i_band: int = 0, mode: str = "RRS"):
    """User-facing multisensor + inelastic run (reference
    rt_run_test_ms(RS_type, ...) with CompositeLayerMSRS containers).

    Returns (uwJ, dwJ, ieuwJ, iedwJ), each (n_sensors, nVZA, ns, nSpec);
    total radiance at a sensor = uwJ + ieuwJ (up) / dwJ + iedwJ (down).
    """
    from .inelastic import inelastic_setup
    (inputs, config, shifts, w_shifts, Z_r_pp, Z_r_mp, fscatt,
     src_fn) = inelastic_setup(model, i_band, mode)
    nz = config.nz
    levels = tuple(int(v) for v in sensor_levels)
    for v in levels:
        if not (0 <= v <= nz):
            raise ValueError(f"sensor level {v} outside [0, {nz}]")
    out = rt_solve_ms_rrs(inputs, config, levels, shifts, w_shifts,
                          Z_r_pp, Z_r_mp, fscatt, src_fn=src_fn)
    return tuple(np.asarray(out[k])
                 for k in ("uwJ", "dwJ", "ieuwJ", "iedwJ"))
