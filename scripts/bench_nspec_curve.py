"""nSpec scaling curve for the flagship forward solve (VERDICT r3 item 5):
the reference's only wall-clock datapoints live at nSpec=17/60
(Tutorial_GPU.md:121-122) — characterize our throughput from their
operating point up to the bench width."""
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _flagship_model  # noqa: E402
from vsmartmom_tpu.core.solver import rt_solve  # noqa: E402


def run_one(n_spec, reps=10):
    model = _flagship_model(n_spec=n_spec, dtype=np.float32, nstreams=8)
    inputs, config = model.build_band(0)
    fn = jax.jit(lambda x: rt_solve(x, config)["R"])
    t0 = time.perf_counter()
    out = fn(inputs)
    _ = np.asarray(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(inputs)
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"nSpec={n_spec:5d}: {dt*1e3:8.2f} ms/solve  "
          f"{n_spec/dt:8.0f} pts/s  (pack={config.pack}, "
          f"cold-compile {compile_s:.0f}s)", flush=True)
    return n_spec / dt


def main():
    for n in (16, 60, 256, 1024, 4096):
        run_one(n)


if __name__ == "__main__":
    main()
