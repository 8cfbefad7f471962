"""Deployment compile-cache warmer (VERDICT r4 item 8).

Mosaic compiles of the band kernels are a per-(Nquad, nz, m_scat,
spectral-chunk, block) cost (~36 s forward, ~3+ min for the tangent
kernels on this tunnel) amortized by the persistent compilation cache.
This script runs ONE solve of each production configuration so a
deployment pays compile cost here, once, instead of on first user
request.

Usage:
    python scripts/warm_cache.py [--forward 1024,4096] [--lin 1024]
                                 [--rrs 256] [--skip-lin] [--skip-rrs]

Each value is a spectral chunk width; compiles are keyed by chunk width,
so list every width your serving path uses (bench.py uses 1024-point
chunks for the forward headline).
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def _warm(label, fn):
    t0 = time.perf_counter()
    fn()
    print(f"warmed {label:30s} {time.perf_counter() - t0:7.1f} s",
          flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--forward", default="1024")
    ap.add_argument("--lin", default="1024")
    ap.add_argument("--rrs", default="256")
    ap.add_argument("--skip-lin", action="store_true")
    ap.add_argument("--skip-rrs", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from __graft_entry__ import _flagship_model
    from vsmartmom_tpu.core.solver import rt_solve

    for w in (int(v) for v in args.forward.split(",") if v):
        model = _flagship_model(n_spec=w, dtype=np.float32, nstreams=8)
        inputs, config = model.build_band(0)

        def run(inputs=inputs, config=config):
            out = jax.jit(lambda x: rt_solve(x, config)["R"])(inputs)
            out.block_until_ready()
        _warm(f"forward flagship nSpec={w}", run)

    if not args.skip_lin:
        for w in (int(v) for v in args.lin.split(",") if v):
            from vsmartmom_tpu.core.linearization import (default_layout,
                                                          rt_run_lin)
            model = _flagship_model(n_spec=w, dtype=np.float32,
                                    nstreams=8, aerosol=True)

            def run(model=model):
                rt_run_lin(model, layout=default_layout(model))
            _warm(f"linearized (multitangent) nSpec={w}", run)

    if not args.skip_rrs:
        for w in (int(v) for v in args.rrs.split(",") if v):
            import bench_rrs

            def run(w=w):
                bench_rrs.main(n_spec=w, reps=1, parity=False)
            _warm(f"RRS+SIF nSpec={w}", run)


if __name__ == "__main__":
    main()
