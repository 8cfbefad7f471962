"""HISTORICAL (round 3) — INVALID probe, kept for the record: rt_solve is
itself jitted with static config, so patching fused_rt._bmm after the
first compile reused the cached executable (PERF.md round-4 precision
study). Use scripts/probe_prec_bench.py / probe_split3.py instead."""
import dataclasses
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _flagship_model  # noqa: E402

import vsmartmom_tpu.ops.fused_rt as FR  # noqa: E402
from vsmartmom_tpu.core.solver import rt_solve  # noqa: E402


def set_precision(prec):
    import jax.numpy as jnp

    def _bmm(a, b, mode="highest"):
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
    FR._bmm = _bmm


def run(prec, inputs, config, plain_R, n_rep=8):
    set_precision(prec)
    fn = jax.jit(lambda x: rt_solve(x, config)["R"])
    out = fn(inputs)
    jax.block_until_ready(out)
    rel = float(np.max(np.abs(np.asarray(out) - plain_R))
                / np.max(np.abs(plain_R)))
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(inputs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_rep
    n = config.n_spec
    print(f"precision={prec}: rel-vs-plain {rel:.2e}, {dt*1e3:.1f} ms, "
          f"{n/dt:.0f} pts/s", flush=True)


def main():
    model = _flagship_model(n_spec=1024, dtype=np.float32, nstreams=8)
    inputs, config = model.build_band(0)
    plain = dataclasses.replace(config, fused=False, pack=1, m_scat=-1,
                                ns_sched=(), ns_inter=6)
    plain_R = np.asarray(jax.jit(lambda x: rt_solve(x, plain)["R"])(inputs))
    for prec in ("highest", "high"):
        run(prec, inputs, config, plain_R)


if __name__ == "__main__":
    main()
