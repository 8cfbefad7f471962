"""RRS + SIF hyperspectral benchmark (BASELINE.md's "inelastic Raman (RRS)
+ SIF hyperspectral run", reference test_forward_raman path).

Scene: Rayleigh column + Lambertian surface with a SIF source, fine
hyperspectral grid so the rotational-Raman redistribution has O(100)
active index shifts. Prints sustained points/s with a value-fetch sync and
a parity check of the elastic sub-result vs the elastic-only solver."""
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from vsmartmom_tpu import model_from_parameters  # noqa: E402
from vsmartmom_tpu.core.inelastic import (inelastic_setup,  # noqa: E402
                                          rt_solve_rrs)
from vsmartmom_tpu.core.model import (Parameters,  # noqa: E402
                                      SurfaceDescriptor)
from vsmartmom_tpu.scattering.stokes import STOKES_IQU  # noqa: E402


def _model(n_spec):
    nu = 12950.0 + 0.6 * np.arange(n_spec)      # ~0.6 cm^-1 hyperspectral
    params = Parameters(
        spec_bands=[nu],
        surfaces=[SurfaceDescriptor("LambertianSurfaceScalar", [0.05])],
        nstreams=8, polarization=STOKES_IQU,
        sza=45.0, vza=[0.0, 30.0, 60.0], vaz=[0.0, 0.0, 0.0], obs_alt=0.0,
        T=np.linspace(230.0, 290.0, 8),
        p=np.linspace(50.0, 1013.0, 9),
        depol=-1.0, float_type=np.float32)
    model = model_from_parameters(params)
    # SIF emission on the band (sif source riding the same solve)
    model.bands[0].sif_spec = 1e-3 * np.ones(n_spec)
    return model


def main(n_spec=1024, reps=5, force_xla=False, parity=True):
    from vsmartmom_tpu.core.inelastic import rt_solve_rrs_fused
    model = _model(n_spec)
    (inputs, config, shifts, w_shifts, Z_r_pp, Z_r_mp, fscatt,
     src_fn) = inelastic_setup(model)
    fused = bool(config.fused) and not force_xla
    print(f"nSpec={n_spec}, nShifts={len(shifts)}, "
          f"n_m={config.m_max + 1}, nz={config.nz}, N={config.N}, "
          f"fused={fused} pack={config.pack} dot={config.dot_mode}",
          flush=True)

    if fused:
        fn = jax.jit(lambda i: rt_solve_rrs_fused(i, config, shifts,
                                                  w_shifts, Z_r_pp, Z_r_mp,
                                                  fscatt))
    else:
        fn = jax.jit(lambda i: rt_solve_rrs(i, config, shifts, w_shifts,
                                            Z_r_pp, Z_r_mp, fscatt,
                                            src_fn=src_fn))
    t0 = time.perf_counter()
    out = fn(inputs)
    _ = np.asarray(out["ieR"])
    print(f"cold compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    assert np.isfinite(np.asarray(out["R"])).all()
    assert np.isfinite(np.asarray(out["ieR"])).all()

    rels = {}
    if fused and parity:
        # On-device parity gate vs the XLA reference-shaped path. The XLA
        # path's (nR, s, N, N) arrays pad ~4x in HBM (lane padding), so
        # the gate runs at a bounded width — same physics, same kernels.
        if n_spec <= 512:
            p_inputs, p_cfg, p_out = inputs, config, out
            p_shifts, p_w, p_fsc, p_src = shifts, w_shifts, fscatt, src_fn
        else:
            p_model = _model(256)
            (p_inputs, p_cfg, p_shifts, p_w, Zp, Zm, p_fsc,
             p_src) = inelastic_setup(p_model)
            p_out = rt_solve_rrs_fused(p_inputs, p_cfg, p_shifts, p_w,
                                       Zp, Zm, p_fsc)
            Z_r_pp_p, Z_r_mp_p = Zp, Zm
        if n_spec <= 512:
            Z_r_pp_p, Z_r_mp_p = Z_r_pp, Z_r_mp
        ref = rt_solve_rrs(p_inputs, p_cfg, p_shifts, p_w, Z_r_pp_p,
                           Z_r_mp_p, p_fsc, src_fn=p_src)
        for k in ("R", "ieR"):
            a, b = np.asarray(p_out[k]), np.asarray(ref[k])
            rels[k] = float(np.max(np.abs(a - b))
                            / (np.max(np.abs(b)) + 1e-30))
        print(f"parity vs XLA path: R {rels['R']:.2e}, "
              f"ieR {rels['ieR']:.2e}", flush=True)
        assert rels["R"] < 1e-4 and rels["ieR"] < 5e-3, rels
        del p_out, ref

    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(inputs)
    _ = np.asarray(out["ieR"])
    dt = (time.perf_counter() - t0) / reps
    print(f"RRS+SIF solve: {dt*1e3:.1f} ms -> {n_spec/dt:.0f} pts/s "
          f"({n_spec * len(shifts) / dt:.2e} shift-pts/s)", flush=True)
    return {"pts_per_s": n_spec / dt, "ms": dt * 1e3, "parity": rels,
            "n_spec": n_spec, "n_shifts": len(shifts), "fused": fused}


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
