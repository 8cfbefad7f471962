"""Compile-time and runtime scaling of fused_moment vs shape knobs."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from scripts.probe_band import make_inputs  # noqa: E402

from vsmartmom_tpu.ops.fused_band import fused_moment  # noqa: E402


def one(N, s, nz, ndoubl, sched, pack, block, n_stokes=4, reps=10):
    rng = np.random.default_rng(0)
    args, i0 = make_inputs(rng, nz, s, 2, N, n_stokes, ndoubl)
    kw = dict(ndoubl=ndoubl, ns_sched=sched, ns_inter=3, pack=pack,
              n_stokes=n_stokes, i_mu0_start=i0, n_sources=1, block=block,
              interpret=False)
    f = jax.jit(lambda *a: fused_moment(*a, **kw))
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"N={N} s={s} nz={nz} ndoubl={ndoubl} pack={pack} block={block}: "
          f"compile {t_compile:.1f}s run {dt*1e3:.2f} ms "
          f"({s/dt:.0f} pts/s/moment)", flush=True)


if __name__ == "__main__":
    case = sys.argv[1] if len(sys.argv) > 1 else "small"
    if case == "small":
        one(52, 64, 4, 4, (1, 1, 2, 2), 2, 8)
    elif case == "mid":
        one(52, 128, 33, 8, (1, 1, 1, 1, 2, 2, 2, 2), 2, 8)
    elif case == "bench":
        one(52, 512, 33, 8, (1, 1, 1, 1, 2, 2, 2, 2), 2, 8)
    elif case == "bench16":
        one(52, 512, 33, 8, (1, 1, 1, 1, 2, 2, 2, 2), 2, 16)
