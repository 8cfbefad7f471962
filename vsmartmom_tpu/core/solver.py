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

from .kernels import (AddedLayer, CompositeLayer, doubling, elemental,
                      identity_composite, interaction)
from .types import SolverConfig, SolverInputs, stokes_d_vector


def _mixed_omega_Z(scat_w_z, Z_comp, tau_z):
    """omega_lambda * Z_mixed = sum_c w_c Z_c / tau  -> (nSpec, N, N).

    This fuses the reference's optics mixing (types.jl:1262-1292) with the
    expansion to the spectral batch (expandOpticalProperties) — the mixed
    supermatrix is never stored, only materialized inside the layer step.
    """
    num = jnp.einsum("cs,cij->sij", scat_w_z, Z_comp, precision="highest")
    safe_tau = jnp.where(tau_z > 0, tau_z, 1.0)
    return num / safe_tau[:, None, None]


def _elemental_and_sources(layer_data, *, Z_pp_m, Z_mp_m, qp_mu_N, wt_mu_N,
                           mu0, config: SolverConfig, F0, fourier_w, is_m0):
    """Elemental slab operators + stacked per-source j vectors.

    Slot 0 is the solar beam (SFI), slot 1 (when config.n_sources == 2) the
    per-layer Planck thermal volume source (thermal_emission.jl:241-292)
    which is isotropic (m = 0 only, Stokes-I) and doubles with expk = 1.

    Returns (r_mp, t_pp, j0_p, j0_m, expk) with sources (s, N, K) and
    expk (s, K).
    """
    tau_z, scat_w_z, tau_sum_z, thermal_b_z = layer_data
    dtype = tau_z.dtype
    dtau = tau_z / (2 ** config.ndoubl)
    wZ_pp = _mixed_omega_Z(scat_w_z, Z_pp_m, tau_z)
    wZ_mp = _mixed_omega_Z(scat_w_z, Z_mp_m, tau_z)

    r_mp, t_pp, j_sol_p, j_sol_m = elemental(
        wZ_pp, wZ_mp, dtau, tau_sum_z, qp_mu_N, wt_mu_N, mu0,
        config.i_mu0_start, config.n_stokes, F0, fourier_w)

    from .kernels import _exp, _expm1
    expk_sol = _exp(-dtau / mu0)
    if config.n_sources == 1:
        j0_p = j_sol_p[..., None]
        j0_m = j_sol_m[..., None]
        expk = expk_sol[:, None]
    else:
        # Exact finite-dtau isothermal thermal source, Stokes-I rows only:
        # j = 2pi (1 - pi_lambda) B (1 - e^{-dtau/mu_i}); the 2pi undoes the
        # 0.5/pi postprocessing weight so B(T) survives in radiance units.
        ssa = jnp.sum(scat_w_z, axis=0) / jnp.where(tau_z > 0, tau_z, 1.0)
        is_I = ((jnp.arange(config.N) % config.n_stokes) == 0).astype(dtype)
        j_th = (2.0 * jnp.pi * (1.0 - ssa)[:, None] * thermal_b_z[:, None]
                * (-_expm1(-dtau[:, None] / qp_mu_N[None, :]))
                * is_I[None, :]) * is_m0.astype(dtype)
        j0_p = jnp.stack([j_sol_p, j_th], axis=-1)
        j0_m = jnp.stack([j_sol_m, j_th], axis=-1)
        expk = jnp.stack([expk_sol, jnp.ones_like(expk_sol)], axis=-1)
    return r_mp, t_pp, j0_p, j0_m, expk


def _make_added_layer(layer_data, *, d_vec, config: SolverConfig, **kw):
    """Homogeneous-layer operators (elemental -> doubling), unpacked —
    used by the multisensor driver which stashes per-layer operators."""
    r_mp, t_pp, j0_p, j0_m, expk = _elemental_and_sources(
        layer_data, config=config, **kw)
    return doubling(r_mp, t_pp, j0_p, j0_m, expk, config.ndoubl, d_vec)


def _layer_step(comp, layer_data, *, d_vec, config: SolverConfig, **kw):
    """One layer of the vertical scan: elemental -> doubling -> interaction.

    Three execution paths, identical algebra (tests assert parity):
      * fused  — Pallas VMEM-resident doubling+interaction on (optionally
        block-diagonally packed) operators, the TPU product path;
      * packed XLA — same packing, XLA doubling/interaction (CPU-testable,
        and the VSM_NO_FUSED measurement baseline on TPU);
      * plain XLA — the reference-shaped per-spectral-point path.
    The composite ``comp`` is carried PACKED through the scan when
    config.pack > 1 (ops/packing.py).
    """
    r_mp, t_pp, j0_p, j0_m, expk = _elemental_and_sources(
        layer_data, config=config, **kw)
    p = config.pack
    if p > 1 or config.fused:
        from ..ops.packing import pack_mat, pack_vec
        # Row-wise expk, packed along rows with the source vectors.
        ek_rows = pack_vec(jnp.broadcast_to(
            expk[:, None, :], j0_p.shape), p)
        d_p = jnp.tile(d_vec, p)
        if config.fused:
            from ..ops.fused_rt import fused_layer_step, pick_block
            r_star = pack_mat(r_mp * d_vec[None, :, None], p)
            jm_star = pack_vec(j0_m * d_vec[None, :, None], p)
            Np = r_star.shape[-1]
            out = fused_layer_step(
                tuple(comp), r_star, pack_mat(t_pp, p), pack_vec(j0_p, p),
                jm_star, ek_rows, d_p, config.ndoubl,
                ns_sched=config.ns_sched or None, ns_inter=config.ns_inter,
                block=pick_block(r_star.shape[0], Np),
                dot_mode=config.dot_mode)
            return CompositeLayer(*out), None
        add = doubling(pack_mat(r_mp, p), pack_mat(t_pp, p),
                       pack_vec(j0_p, p), pack_vec(j0_m, p),
                       ek_rows, config.ndoubl, d_p)
        return interaction(comp, add), None
    add = doubling(r_mp, t_pp, j0_p, j0_m, expk, config.ndoubl, d_vec)
    return interaction(comp, add), None


def _surface_layer(surf_r_m, surf_j_m, surf_direct_m, surf_spec, F0,
                   tau_sum_boa, mu0, sif_spec, is_m0,
                   config: SolverConfig, dtype) -> AddedLayer:
    """Surface as an AddedLayer (reference Surfaces/*.jl create_surface_layer!).

    ``surf_r_m`` already includes the quadrature factor diag(mu_N * w_N);
    ``surf_j_m`` is mu0 * R_raw[:, solar block] (N, n_stokes). Both get the
    spectral scaling ``surf_spec`` and solar attenuation exp(-tau_sum/mu0).
    ``surf_direct_m`` masks the direct-beam j0+ (Lambertian: m = 0 only;
    numeric BRDFs: every moment — see model._surface_arrays).
    """
    n_spec, N = config.n_spec, config.N
    from .kernels import _exp
    att = _exp(-tau_sum_boa / mu0)                          # (s,)
    spec = surf_spec

    # Spectrally-resolved surface operators (e.g. canopy with spectral leaf
    # optics) arrive as (n_spec, N, N) / (n_spec, N, ns); spectrally-factored
    # surfaces as (N, N) x surf_spec.
    if surf_r_m.ndim == 3:
        r_mp = surf_r_m * spec[:, None, None]
    else:
        r_mp = surf_r_m[None] * spec[:, None, None] \
            * jnp.ones((n_spec, 1, 1), dtype)
    eye = jnp.broadcast_to(jnp.eye(N, dtype=dtype), (n_spec, N, N))
    zero_m = jnp.zeros((n_spec, N, N), dtype)

    j0_p = jnp.zeros((n_spec, N), dtype)
    j0_p = j0_p.at[:, config.i_mu0_start:config.i_mu0_start + config.n_stokes].set(
        (F0 * att[None, :]).T * surf_direct_m)
    if surf_j_m.ndim == 3:
        j0_m = jnp.einsum("sik,ks->si", surf_j_m, F0,
                          precision="highest") * (att * spec)[:, None]
    else:
        j0_m = jnp.einsum("ik,ks->si", surf_j_m, F0,
                          precision="highest") * (att * spec)[:, None]
    # Surface SIF: isotropic Lambertian emission into the upwelling source,
    # m = 0 only; factor 2 = (1/pi irradiance->radiance) x (2pi weight undo)
    # (surface_sif.jl:24-34,177).
    is_I = ((jnp.arange(N) % config.n_stokes) == 0).astype(dtype)
    j0_m = j0_m + 2.0 * sif_spec[None, :].T * is_I[None, :] * is_m0.astype(dtype)

    K = config.n_sources
    zeros_v = jnp.zeros((n_spec, N, K - 1), dtype)
    j0_p = jnp.concatenate([j0_p[..., None], zeros_v], axis=-1)
    j0_m = jnp.concatenate([j0_m[..., None], zeros_v], axis=-1)
    return AddedLayer(r_mp, zero_m, eye, eye, j0_p, j0_m)


@partial(jax.jit, static_argnames=("config",))
def rt_solve(inputs: SolverInputs, config: SolverConfig):
    """Full multi-moment solve. Returns dict with R, T (nVZA, n_stokes, nSpec)
    plus the BOA downwelling/TOA upwelling stream vectors of the m = 0 moment
    (for flux diagnostics).

    The Fourier-azimuth loop is a ``lax.scan`` over the stacked per-moment
    inputs (Z supermatrices, surface operators, azimuthal weights) — one
    compiled moment body regardless of m_max, with the per-VZA weighted
    accumulation carried on-device.
    """
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
    surf_spec = inputs.surf_spec.astype(dtype)

    # Cumulative optical depth above each layer (extractEffectiveProps,
    # compEffectiveLayerProperties.jl:84-91) — one cumsum, on-device.
    tau_sum = jnp.concatenate(
        [jnp.zeros((1, n_spec), dtype), jnp.cumsum(tau, axis=0)], axis=0)

    nvza = len(config.vza_idx)
    vza_rows = np.asarray(
        [[v * ns + k for k in range(ns)] for v in config.vza_idx])  # (nvza, ns)

    n_m = config.m_max + 1
    fourier_w = jnp.asarray([0.5] + [0.25] * (n_m - 1), dtype)

    thermal_b = inputs.thermal_b.astype(dtype)    # (Nz, s)
    sif_spec = inputs.sif_spec.astype(dtype)      # (s,)

    # Whole-moment fused path (ops/fused_band.py): precompute the
    # moment-independent f64-accurate transcendental precursors once —
    # the kernel consumes them so its numerics match kernels.elemental.
    use_band = bool(config.fused) and nz >= 1
    if use_band:
        from .kernels import _exp, _expm1
        dtau_z = tau / (2.0 ** config.ndoubl)                  # (nz, s)
        Em1_pre = _expm1(-dtau_z[:, :, None] / qp_mu_N[None, None, :])
        Em10_pre = _expm1(-dtau_z / mu0)
        att_pre = _exp(-tau_sum[:nz] / mu0)
        ek_pre = _exp(-dtau_z / mu0)
        safe_tau_z = jnp.where(tau > 0, tau, 1.0)
        ssa_z = jnp.sum(scat_w, axis=1) / safe_tau_z
        th_base = 2.0 * jnp.pi * (1.0 - ssa_z) * thermal_b     # (nz, s)
        is_I_vec = ((jnp.arange(N) % config.n_stokes) == 0).astype(dtype)
        idx = jnp.arange(N)
        in_blk_vec = (((idx >= config.i_mu0_start)
                       & (idx < config.i_mu0_start + config.n_stokes))
                      | (jnp.abs(qp_mu_N - mu0) <= 1e-9 * mu0)).astype(dtype)

    def moment_body(carry, xs):
        R, T, hdr, bhr_uw, bhr_dw, Jup0, Jdn0 = carry
        (Z_pp_m, Z_mp_m, surf_r_m, surf_j_m, direct_m, vza_w_m, fw, is_m0) = xs

        p = config.pack
        if use_band:
            from ..ops.fused_band import fused_moment
            with jax.named_scope("layers_fused"):
                comp = CompositeLayer(*fused_moment(
                    Z_pp_m, Z_mp_m, tau, scat_w, Em1_pre, Em10_pre,
                    att_pre, ek_pre, th_base * is_m0.astype(dtype), F0 * fw,
                    qp_mu_N, fw * wt_mu_N, d_vec, is_I_vec, in_blk_vec,
                    ndoubl=config.ndoubl, ns_sched=config.ns_sched or None,
                    ns_inter=config.ns_inter, pack=p,
                    n_stokes=config.n_stokes,
                    i_mu0_start=config.i_mu0_start,
                    n_sources=config.n_sources,
                    dot_mode=config.dot_mode,
                    block=config.band_block))
        else:
            step = partial(_layer_step, Z_pp_m=Z_pp_m, Z_mp_m=Z_mp_m,
                           qp_mu_N=qp_mu_N, wt_mu_N=wt_mu_N, mu0=mu0,
                           config=config, F0=F0, fourier_w=fw, is_m0=is_m0,
                           d_vec=d_vec)

            # The composite is carried block-diagonally PACKED when pack > 1
            # (ops/packing.py): p spectral points share one (pN, pN)
            # operator for MXU tile utilization.
            comp = identity_composite(n_spec // p, N * p, dtype,
                                      config.n_sources)
            with jax.named_scope("layer_scan"):
                comp, _ = jax.lax.scan(step, comp,
                                       (tau, scat_w, tau_sum[:nz],
                                        thermal_b))

        surf = _surface_layer(surf_r_m, surf_j_m, direct_m, surf_spec, F0,
                              tau_sum[nz], mu0, sif_spec, is_m0, config, dtype)
        if p > 1:
            from ..ops.packing import pack_mat, pack_vec, unpack_vec
            surf_p = AddedLayer(*(pack_mat(a, p) for a in surf[:4]),
                                *(pack_vec(a, p) for a in surf[4:]))
        else:
            from ..ops.packing import unpack_vec
            surf_p = surf
        with jax.named_scope("surface_interaction"):
            comp_out = interaction(comp, surf_p)

        # Azimuthal weighting (postprocessing_vza.jl:50-94), on-device:
        # R += w * sum_sources J0-(rows), T += w * sum_sources J0+(rows)
        # (RT reconstruction is linear in sources; each slot adds into the
        # same output — postprocessing_vza.jl:68-82).
        J0_m = unpack_vec(comp_out.J0_m, p).sum(axis=-1)    # (s, N)
        J0_p = unpack_vec(comp_out.J0_p, p).sum(axis=-1)
        Jm_rows = J0_m[:, vza_rows]          # (s, nvza, ns)
        Jp_rows = J0_p[:, vza_rows]
        R = R + jnp.transpose(Jm_rows, (1, 2, 0)) * vza_w_m[:, :, None]
        T = T + jnp.transpose(Jp_rows, (1, 2, 0)) * vza_w_m[:, :, None]

        # HDRF / BHR accumulation (interaction_hdrf.jl:1-42): surface-leaving
        # radiance r_surf @ J0+(post-surface) + j_surf-; bi-hemispherical
        # fluxes at m = 0 with the direct term added at the solar node.
        from .kernels import _bmv
        hdr_J = (unpack_vec(_bmv(surf_p.r_mp, comp_out.J0_p), p).sum(axis=-1)
                 + surf.j0_m.sum(axis=-1))                   # (s, N)
        hdr = hdr + jnp.transpose(hdr_J[:, vza_rows], (1, 2, 0)) \
            * vza_w_m[:, :, None]
        wq = (wt_mu_N * qp_mu_N)
        i_I = (jnp.arange(N) % ns) == 0
        flux_uw = jnp.sum(hdr_J * (wq * i_I)[None, :], axis=1)      # (s,)
        flux_dw = (jnp.sum(J0_p * (wq * i_I)[None, :], axis=1)
                   + surf.j0_p[:, config.i_mu0_start, 0]
                   * qp_mu_N[config.i_mu0_start])
        bhr_uw = bhr_uw + is_m0.astype(dtype) * flux_uw
        bhr_dw = bhr_dw + is_m0.astype(dtype) * flux_dw

        Jup0 = jnp.where(is_m0, J0_m, Jup0)
        Jdn0 = jnp.where(is_m0, J0_p, Jdn0)
        ys = (J0_m, J0_p) if config.save_streams else None
        return (R, T, hdr, bhr_uw, bhr_dw, Jup0, Jdn0), ys

    init = (jnp.zeros((nvza, ns, n_spec), dtype),
            jnp.zeros((nvza, ns, n_spec), dtype),
            jnp.zeros((nvza, ns, n_spec), dtype),
            jnp.zeros((n_spec,), dtype),
            jnp.zeros((n_spec,), dtype),
            jnp.zeros((n_spec, N), dtype),
            jnp.zeros((n_spec, N), dtype))
    xs = (inputs.Z_pp.astype(dtype), inputs.Z_mp.astype(dtype),
          inputs.surf_r.astype(dtype), inputs.surf_j_m.astype(dtype),
          inputs.surf_direct_m.astype(dtype), inputs.vza_w.astype(dtype),
          fourier_w, jnp.arange(n_m) == 0)

    # Static moment split: moments above m_scat see a purely absorbing
    # atmosphere (all Z supermatrices vanish) and the layer chain reduces
    # exactly to diagonal Beer-law transmission — the reference handles
    # this with ScatteringInterface_00 trait dispatch (interaction.jl:
    # 52-120); here it is a compile-time split that skips the entire GEMM
    # chain for those moments (e.g. Cox-Munk drives m_max to the stream
    # cap but Rayleigh scattering stops at m = 2: 13 of 16 moments take
    # this path on the flagship ocean scene).
    n_full = n_m if config.m_scat < 0 else min(config.m_scat + 1, n_m)
    if inputs.surf_r.ndim == 4 or inputs.surf_j_m.ndim == 4:
        n_full = n_m   # spectrally-resolved surface (canopy): keep full path
    xs_full = jax.tree_util.tree_map(lambda a: a[:n_full], xs)
    (R, T, hdr, bhr_uw, bhr_dw, Jup0, Jdn0), ys = \
        jax.lax.scan(moment_body, init, xs_full)

    ys_tail = None
    if n_full < n_m:
        from .kernels import _exp
        surf_r_rest = xs[2][n_full:]          # (M2, N, N)
        surf_j_rest = xs[3][n_full:]          # (M2, N, ns)
        direct_rest = xs[4][n_full:]          # (M2,)
        vza_w_rest = xs[5][n_full:]           # (M2, nvza, ns)

        tau_tot = tau_sum[nz]                                  # (s,)
        att = _exp(-tau_tot / mu0)                             # (s,)
        Tdiag = _exp(-tau_tot[:, None] / qp_mu_N[None, :])     # (s, N)

        # Surface upwelling source per moment, Beer-attenuated to TOA.
        j0m = jnp.einsum("mik,ks->msi", surf_j_rest, F0,
                         precision="highest") \
            * (att * surf_spec)[None, :, None]                 # (M2, s, N)
        Jtoa = Tdiag[None] * j0m
        R = R + jnp.einsum("msvk,mvk->vks", Jtoa[:, :, vza_rows],
                           vza_w_rest, precision="highest")

        # Direct solar beam at the surface (masked per moment for numeric
        # BRDFs — see _surface_layer) feeds T and the HDRF reflection.
        j0p_vec = jnp.zeros((n_spec, N), dtype)
        j0p_vec = j0p_vec.at[
            :, config.i_mu0_start:config.i_mu0_start + ns].set(
            (F0 * att[None, :]).T)                             # (s, N)
        j0p_m = j0p_vec[None] * direct_rest[:, None, None]     # (M2, s, N)
        T = T + jnp.einsum("msvk,mvk->vks", j0p_m[:, :, vza_rows],
                           vza_w_rest, precision="highest")

        hdr_J = jnp.einsum("mij,msj->msi", surf_r_rest, j0p_m,
                           precision="highest") \
            * surf_spec[None, :, None] + j0m                   # (M2, s, N)
        hdr = hdr + jnp.einsum("msvk,mvk->vks", hdr_J[:, :, vza_rows],
                               vza_w_rest, precision="highest")
        if config.save_streams:
            ys_tail = (Jtoa, j0p_m)

    out = {"R": R, "T": T, "hdr": hdr, "bhr_uw": bhr_uw, "bhr_dw": bhr_dw,
           "J0_up_toa": Jup0, "J0_dn_boa": Jdn0}
    if config.save_streams:
        J_up, J_dn = ys
        if ys_tail is not None:
            J_up = jnp.concatenate([J_up, ys_tail[0]], axis=0)
            J_dn = jnp.concatenate([J_dn, ys_tail[1]], axis=0)
        out["J_up_per_m"], out["J_dn_per_m"] = J_up, J_dn   # (n_m, s, N)
    return out


def rt_run_full(model):
    """Forward run returning every reference output (rt_run.jl:535 minus the
    inelastic slots — see inelastic.rt_run_inelastic for ieR/ieT) as a dict
    with keys R, T, hdr, bhr_uw, bhr_dw, each concatenated over bands.

    Canopy-scene divergence from the reference: for CanopySurface scenes the
    direct-beam j0+ slot at canopy top carries the soil-reflected direct
    beam (canopy-top fields), where the reference zeroes it
    (canopy_surface.jl:459). This gives LAI->0 continuity with the bare-soil
    scene and the conservative bhr_uw == bhr_dw invariant, but T and bhr_dw
    for canopy scenes include the direct beam with only above-canopy
    attenuation and will not match reference values even when R does.

    One rt_solve per band computes all outputs (the solver already carries
    hdr/bhr through the Fourier scan). Cox-Munk surfaces get the TMS
    single-scatter glint correction applied post-Fourier (rt_run.jl:519-524).
    """
    from ..utils import timing
    acc = {k: [] for k in ("R", "T", "hdr", "bhr_uw", "bhr_dw")}
    for i_band, band in enumerate(model.bands):
        with timing.stage(f"build_band[{i_band}]"):
            inputs, config = model.build_band(i_band)
        with timing.stage(f"rt_solve[{i_band}]"):
            out = rt_solve(inputs, config)
            jax.block_until_ready(out)
        R = np.asarray(out["R"])
        if band.surface.kind == "CoxMunkSurface":
            from ..surfaces.coxmunk import CoxMunkSurface, tms_correction
            surf = CoxMunkSurface(**{k: v for k, v in band.surface.kwargs.items()
                                     if not k.startswith("_")})
            tau_total = np.asarray(inputs.tau).sum(axis=0)   # (nSpec,)
            R = R + tms_correction(surf, config.n_stokes, model.params.vza,
                                   model.params.vaz, model.quad.mu0,
                                   tau_total, config.m_max)
        acc["R"].append(R)
        for k in ("T", "hdr", "bhr_uw", "bhr_dw"):
            acc[k].append(np.asarray(out[k]))
    return {k: np.concatenate(v, axis=-1) for k, v in acc.items()}


def rt_run(model):
    """User-facing forward run on an RTModel (reference rt_run.jl:53).

    Returns (R, T) with shape (nVZA, n_stokes, nSpec_total) concatenated over
    bands, as radiance factors I/F0 (SFI outputs of the reference).
    """
    out = rt_run_full(model)
    if getattr(model.params, "verbose", False) or __import__("os").environ.get(
            "VSM_TIMING"):
        from ..utils import timing
        print(timing.report())
    return out["R"], out["T"]


def rt_run_streams(model, i_band: int = 0):
    """Per-Fourier-moment stream export (reference rt_run_streams,
    rt_run.jl:107-193): the per-moment J vectors at every quadrature stream
    plus the reconstruction weights, so downstream consumers (e.g. disk
    integrators) can Fourier-sum onto arbitrary (mu_v, phi) geometries
    without one rt_run per geometry.

    Returns a dict with J_up_per_m/J_dn_per_m (n_m, nSpec, N), qp_mu, wt_mu,
    weights (the 0.5/pi, 1/pi moment weights), pol_n, and tau profiles.
    """
    import dataclasses
    inputs, config = model.build_band(i_band)
    config = dataclasses.replace(config, save_streams=True)
    out = rt_solve(inputs, config)
    n_m = config.m_max + 1
    weights = np.asarray([0.5 / np.pi] + [1.0 / np.pi] * (n_m - 1))
    band = model.bands[i_band]
    return {
        "J_up_per_m": np.asarray(out["J_up_per_m"]),
        "J_dn_per_m": np.asarray(out["J_dn_per_m"]),
        "weights": weights,
        "qp_mu": model.quad.qp_mu,
        "wt_mu": model.quad.wt_mu,
        "pol_n": config.n_stokes,
        "tau_rayl": band.tau_rayl,
        "tau_abs": band.tau_abs,
        "tau_total": np.asarray(inputs.tau).T,
        "R": np.asarray(out["R"]),
    }
