"""Linearized-run benchmark: rt_run_lin (forward + full Jacobian stack)
spectral points/s on the flagship scene + one Mie aerosol (BASELINE.md's
"linearized model_from_parameters with analytic aerosol/gas/surface
Jacobians" configuration: 7 aerosol + 1 wind parameters).

Prints pts/s for the SOLVER portion (tangent stack prebuilt; the host-side
Mie tangents are a one-time per-scene cost measured separately)."""
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _flagship_model  # noqa: E402
from vsmartmom_tpu.core.linearization import (build_tangent_inputs,  # noqa: E402
                                              default_layout, rt_run_lin)


def main(n_spec=1024):
    t0 = time.perf_counter()
    model = _flagship_model(n_spec=n_spec, dtype=np.float32, nstreams=8,
                            aerosol=True)
    layout = default_layout(model)
    print(f"layout: {layout.names()} ({layout.n_total} params); "
          f"build {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    R, T, dR, dT = rt_run_lin(model, layout=layout)
    print(f"first rt_run_lin (incl. host tangents + compile): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    assert np.isfinite(dR).all() and np.isfinite(dT).all()

    # Solver-only timing: reuse the prebuilt tangent stack.
    import dataclasses  # noqa: F401
    import jax.numpy as jnp
    from vsmartmom_tpu.core.solver import rt_solve
    inputs, config, tangents = build_tangent_inputs(model, 0, layout)
    tangents_j = [jax.tree_util.tree_map(
        lambda t, x: np.asarray(t, dtype=np.asarray(x).dtype), d, inputs)
        for d in tangents]
    tan_stack = jax.tree_util.tree_map(
        lambda *ts: jnp.stack([jnp.asarray(t) for t in ts]), *tangents_j)

    import os
    from vsmartmom_tpu.ops import fused_lin
    use_mt = config.fused and config.n_sources == 1 \
        and not os.environ.get("VSM_LIN_JVP") and not fused_lin.MT_BROKEN
    if use_mt:
        # Multitangent linearize-split kernel: primal ladder once per
        # chunk, all tangents replayed against its residuals
        # (ops/fused_lin.py; VERDICT r4 item 3). Guarded: this tunnel's
        # remote-compile helper crashes on the MT kernel (subprocess
        # exit 1 after ~12 min) — on failure, fall through to timing the
        # per-parameter jvp loop instead of dying.
        import dataclasses
        from vsmartmom_tpu.ops.fused_lin import rt_solve_multitangent
        # The MT kernel's in-kernel dot mode defaults to "highest"
        # (fused_lin._mt_dot_mode — compile-size rationale there);
        # VSM_MT_DOT overrides.
        config_mt = dataclasses.replace(config, band_block=8)
        chunk = int(os.environ.get("VSM_MT_CHUNK", "2"))
        mt = jax.jit(lambda i, t, c: rt_solve_multitangent(
            i, t, c, mt_chunk=chunk), static_argnames=("c",))
        try:
            out = mt(inputs, tangents_j, config_mt)
            jax.block_until_ready(out)
        except Exception as e:                     # noqa: BLE001
            print(f"multitangent kernel unavailable on this toolchain "
                  f"({type(e).__name__}); timing the per-parameter jvp "
                  f"loop instead", flush=True)
            fused_lin.MT_BROKEN = True
            use_mt = False
    if use_mt:
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = mt(inputs, tangents_j, config_mt)
        _ = np.asarray(out[2])
        dt = (time.perf_counter() - t0) / reps
        label = "multitangent"
    else:
        def fn(inp):
            out = rt_solve(inp, config)
            return out["R"], out["T"]

        # Per-parameter loop over one compiled tangent kernel (the vmapped
        # all-parameter jvp OOMs HBM at this width — see rt_run_lin).
        g = jax.jit(lambda d: jax.jvp(fn, (inputs,), (d,))[1])
        tans = [jax.tree_util.tree_map(lambda a: a[i], tan_stack)
                for i in range(len(tangents_j))]
        out = [g(d) for d in tans]
        jax.block_until_ready(out)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = [g(d) for d in tans]
        _ = np.asarray(out[-1][0])
        dt = (time.perf_counter() - t0) / reps
        label = "per-param jvp"
    print(f"linearized solve [{label}] ({layout.n_total} tangents): "
          f"{dt*1e3:.1f} ms -> {n_spec/dt:.0f} pts/s "
          f"({n_spec*layout.n_total/dt:.0f} tangent-pts/s)", flush=True)
    return {"pts_per_s": n_spec / dt,
            "tangent_pts_per_s": n_spec * layout.n_total / dt,
            "ms": dt * 1e3, "n_spec": n_spec, "n_params": layout.n_total}


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
