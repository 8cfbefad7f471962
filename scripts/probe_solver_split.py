"""Locate non-kernel overhead in rt_solve: vary nz and moment split."""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_model
from vsmartmom_tpu.core.solver import rt_solve


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run(n_spec, nz, label, **cfg_over):
    model = _flagship_model(n_spec=n_spec, dtype=np.float32, nstreams=8,
                            nz=nz)
    inputs, config = model.build_band(0)
    if cfg_over:
        config = dataclasses.replace(config, **cfg_over)
    inputs = jax.device_put(inputs)
    fn = jax.jit(lambda x: rt_solve(x, config)["R"])
    dt = timeit(fn, inputs)
    print(f"{label:34s} nz={config.nz:3d} m_scat={config.m_scat} "
          f"ndoubl={config.ndoubl} : {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    n = 1024
    run(n, None, "full nz=33")
    run(n, 17, "nz=17")
    run(n, 9, "nz=9")
    run(n, None, "m_scat=0 (1 full moment)", m_scat=0)
    run(n, None, "no thermal? n/a; ns all-1", ns_sched=(1,) * 8, ns_inter=1)


if __name__ == "__main__":
    main()
