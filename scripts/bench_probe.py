"""Probe: properly-synced timing of rt_solve at increasing nSpec.

Prints ms/solve, implied TFLOP/s vs an estimated FLOP count, for each size.
Used to root-cause the round-1 bench fault at nSpec=4096.
"""
import sys
import time

import numpy as np


def flops_per_solve(n_spec, N, nz, n_m, ndoubl, n_sources):
    """Rough FLOP count of rt_solve: batched GEMMs + LU solves dominate.

    GEMM (N,N)@(N,N): 2 N^3. Solve with N rhs via LU: ~(2/3)N^3 + 2N^3.
    Per doubling step: 1 solve + 5 GEMM-ish (r@r, t@gp, r@t, tt_gp@(..),
    tt_gp@t) plus source mat-vecs (negligible, K small).
    Per interaction: 2 solves + 6 GEMMs.
    Elemental: O(N^2) elementwise — negligible.
    """
    gemm = 2.0 * N**3
    solve = (2.0 / 3.0 + 2.0) * N**3
    per_doubling = solve + 5 * gemm
    per_layer = ndoubl * per_doubling + (2 * solve + 6 * gemm)
    return n_m * nz * per_layer * n_spec


def main():
    import jax

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_model
    from vsmartmom_tpu.core.solver import rt_solve

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    sizes = [int(s) for s in (sys.argv[1:] or [256, 1024, 2048, 4096])]
    for n_spec in sizes:
        model = _flagship_model(n_spec=n_spec, dtype=np.float32, nstreams=8)
        inputs, config = model.build_band(0)
        N, nz, n_m = config.N, config.nz, config.m_max + 1
        ndoubl = config.ndoubl

        fn = jax.jit(lambda x: rt_solve(x, config)["R"])
        r = fn(inputs)
        r.block_until_ready()
        # verify values finite
        arr = np.asarray(r)
        ok = np.isfinite(arr).all()

        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(inputs).block_until_ready()
            times.append(time.perf_counter() - t0)
        dt = min(times)
        fl = flops_per_solve(n_spec, N, nz, n_m, ndoubl, config.n_sources)
        print(f"nSpec={n_spec:6d} N={N} nz={nz} n_m={n_m} ndoubl={ndoubl} "
              f"t={dt*1e3:9.2f} ms  {n_spec/dt:12.0f} pts/s  "
              f"est {fl/1e12:.2f} TFLOP -> {fl/dt/1e12:7.2f} TF/s  "
              f"finite={ok}", flush=True)


def value_check(n_spec=64):
    """TPU vs CPU forward values at small nSpec."""
    import jax
    import numpy as np
    from __graft_entry__ import _flagship_model
    from vsmartmom_tpu.core.solver import rt_solve
    model = _flagship_model(n_spec=n_spec, dtype=np.float32, nstreams=8)
    inputs, config = model.build_band(0)
    out_dev = np.asarray(jax.jit(lambda x: rt_solve(x, config)["R"])(inputs))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        inputs_c = jax.device_put(inputs, cpu)
        out_cpu = np.asarray(jax.jit(lambda x: rt_solve(x, config)["R"])(inputs_c))
    rel = np.abs(out_dev - out_cpu).max() / np.abs(out_cpu).max()
    print(f"value check nSpec={n_spec}: max rel dev-vs-cpu = {rel:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
