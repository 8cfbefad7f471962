"""Multisensor (MS / MS-RS) timing entry for PERF.md: the per-sensor-level
cost of rt_run_ms and rt_run_ms_rrs on the hyperspectral RRS bench scene
(XLA path — the MS stacks keep the reference-shaped algebra; see
core/multisensor.py)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from bench_rrs import _model  # noqa: E402
from vsmartmom_tpu.core.multisensor import rt_run_ms, rt_run_ms_rrs  # noqa: E402


def main(n_spec=256, reps=3):
    model = _model(n_spec)
    nz = model.profile.nz
    levels = [0, nz // 2, nz]
    for label, fn in (("MS elastic", rt_run_ms),
                      ("MS-RS inelastic", rt_run_ms_rrs)):
        t0 = time.perf_counter()
        out = fn(model, levels)
        _ = [np.asarray(o) for o in out]
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(model, levels)
        _ = np.asarray(out[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{label}: {len(levels)} sensor levels, nSpec={n_spec}: "
              f"{dt*1e3:.0f} ms/solve ({n_spec/dt:.0f} pts/s; cold "
              f"{cold:.0f}s)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
