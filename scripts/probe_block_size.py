"""Sustained solve throughput vs band-kernel spectral block size."""
import functools
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _flagship_model  # noqa: E402

import vsmartmom_tpu.ops.fused_band as FB  # noqa: E402
from vsmartmom_tpu.core.solver import rt_solve  # noqa: E402


def main():
    model = _flagship_model(n_spec=1024, dtype=np.float32, nstreams=8)
    inputs, config = model.build_band(0)
    orig = FB.fused_moment
    for block in (4, 8, 16, 32):
        FB.fused_moment = functools.partial(orig, block=block)
        fn = jax.jit(lambda x: rt_solve(x, config)["R"])
        t0 = time.perf_counter()
        out = fn(inputs)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(inputs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 8
        print(f"block={block:3d}: compile {t_compile:.0f}s  {dt*1e3:7.1f} ms "
              f" {config.n_spec/dt:8.0f} pts/s", flush=True)
    FB.fused_moment = orig


if __name__ == "__main__":
    main()
