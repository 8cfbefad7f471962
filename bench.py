"""Headline benchmark: spectral points/s/chip for a full rt_run.

Runs the flagship forward solve (ocean_coxmunk: polarized IQUV Rayleigh
column over a Cox-Munk ocean) and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measurement discipline (round-2 rework, VERDICT item 1):
  * every rep is synced with ``block_until_ready`` and the output is
    checked finite — no async-dispatch artifacts can inflate the number;
  * the solve's FLOP count is estimated from the trip-count-aware op count
    (doubling/interaction GEMM + LU chains) and the implied TFLOP/s is
    checked against the chip's roofline — the bench REFUSES to print a
    number that exceeds physical peak (reported value = -1 instead);
  * the spectral batch runs in chunks (jit once, loop chunks) so the
    working set stays well inside HBM/VMEM at any total width.

``vs_baseline``: the reference publishes no spectral-points/s figure
(BASELINE.json "published" empty; no Julia runtime in this image to measure
it), so we report against its only committed wall-clock datapoint — A100
forward noRS nSpec=60 in ~0.08 s (Tutorial_GPU.md:122) => ~750 points/s on
a same-class (17-stream IQUV) solve. vs_baseline = value / 750.
"""

import json
import time

import numpy as np

# Conservative single-chip peak by device kind, TFLOP/s for f32-accumulated
# MXU work ("highest" precision). Used only as an upper-bound sanity gate.
PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,     # v5e bf16 peak; f32 passes are slower, so
                              # this is a safe upper bound
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,
    "cpu": 2.0,
}


def flops_per_point(N, nz, n_m, ndoubl, n_sources):
    """Estimated FLOPs per spectral point for one rt_solve.

    Per doubling step: 1 batched solve (LU: 2/3 N^3 + N-rhs substitution
    2 N^3) + 5 N^3-GEMMs. Per interaction: 2 solves + 6 GEMMs. Elemental /
    postprocessing are O(N^2) — ignored (< 2%).
    """
    gemm = 2.0 * N ** 3
    solve = (2.0 / 3.0 + 2.0) * N ** 3
    per_layer = ndoubl * (solve + 5 * gemm) + (2 * solve + 6 * gemm)
    return n_m * nz * per_layer


def main():
    import os

    import jax
    if os.environ.get("BENCH_PLATFORM"):      # CPU smoke-testing escape
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    from __graft_entry__ import _flagship_model
    from vsmartmom_tpu.core.solver import rt_solve

    dev = jax.devices()[0]
    kind = dev.device_kind if dev.platform != "cpu" else "cpu"
    peak = PEAK_TFLOPS.get(kind, 459.0)

    n_chunk = 1024
    n_chunks = 4
    n_spec_total = n_chunk * n_chunks

    model = _flagship_model(n_spec=n_spec_total, dtype=np.float32, nstreams=8)
    inputs, config = model.build_band(0)

    # Split the spectral batch into jit-once chunks.
    import dataclasses
    from vsmartmom_tpu.core.types import SolverInputs
    spec_axis = {"tau": 1, "scat_w": 2, "F0": 1, "surf_spec": 0,
                 "thermal_b": 1, "sif_spec": 0}
    config_c = dataclasses.replace(config, n_spec=n_chunk)

    def chunk_inputs(i):
        sl = slice(i * n_chunk, (i + 1) * n_chunk)
        kw = {}
        for f in SolverInputs._fields:
            v = getattr(inputs, f)
            if f in spec_axis:
                idx = [slice(None)] * v.ndim
                idx[spec_axis[f]] = sl
                v = v[tuple(idx)]
            kw[f] = v
        return SolverInputs(**kw)

    chunks = [jax.device_put(chunk_inputs(i)) for i in range(n_chunks)]
    fn = jax.jit(lambda x: rt_solve(x, config_c)["R"])

    # compile + warmup + value check
    out0 = fn(chunks[0])
    out0.block_until_ready()
    if not bool(np.isfinite(np.asarray(out0)).all()):
        print(json.dumps({"metric": "spectral_points_per_s_per_chip",
                          "value": -1.0, "unit": "points/s",
                          "vs_baseline": 0.0,
                          "error": "non-finite output"}))
        return

    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(c) for c in chunks]
        for o in outs:
            o.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)

    pts_per_s = n_spec_total / dt
    fl = flops_per_point(config.N, config.nz, config.m_max + 1,
                         config.ndoubl, config.n_sources) * n_spec_total
    tflops = fl / dt / 1e12
    if tflops > peak:
        print(json.dumps({
            "metric": "spectral_points_per_s_per_chip", "value": -1.0,
            "unit": "points/s", "vs_baseline": 0.0,
            "error": f"implied {tflops:.1f} TF/s exceeds {kind} "
                     f"roofline {peak:.0f} TF/s — timing not trusted"}))
        return

    baseline_pts_per_s = 750.0   # A100 reference datapoint (docstring)
    print(json.dumps({
        "metric": "spectral_points_per_s_per_chip",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / baseline_pts_per_s, 2),
        "detail": {"device": kind, "n_spec": n_spec_total,
                   "ms_per_solve": round(dt * 1e3, 2),
                   "est_tflop_per_solve": round(fl / 1e12, 2),
                   "implied_tflops": round(tflops, 2),
                   "mfu_vs_peak": round(tflops / peak, 4)},
    }))


if __name__ == "__main__":
    main()
