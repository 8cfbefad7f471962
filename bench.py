"""Headline benchmark: spectral points/s/chip for a full rt_run.

Runs the flagship forward solve (polarized IQUV Rayleigh column, Lambertian
surface — upgraded to ocean_coxmunk when Cox-Munk lands) on the available
accelerator and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline``: the reference publishes no spectral-points/s figure
(BASELINE.json "published" is empty); we report against the reference's only
committed wall-clock datapoint — A100 GPU forward noRS nSpec=60 in ~0.08 s
(Tutorial_GPU.md:122) => ~750 points/s on a similar (17-stream IQUV-class)
solve. vs_baseline = value / 750.
"""

import json
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _flagship_model
    from vsmartmom_tpu.core.solver import rt_solve

    n_spec = 4096
    model = _flagship_model(n_spec=n_spec, dtype=np.float32, nstreams=8)
    inputs, config = model.build_band(0)

    fn = jax.jit(lambda x: rt_solve(x, config)["R"])
    # compile + warmup
    fn(inputs)[0].block_until_ready()

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(inputs)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    pts_per_s = n_spec / dt
    baseline_pts_per_s = 750.0   # A100 reference datapoint, see module docstring
    print(json.dumps({
        "metric": "spectral_points_per_s_per_chip",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / baseline_pts_per_s, 2),
    }))


if __name__ == "__main__":
    main()
