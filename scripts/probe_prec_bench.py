"""End-to-end precision study on the REAL bench solve (round-4).

Round-3's probe_prec_high.py was invalid: rt_solve is itself jitted with
static config, so patching fused_rt._bmm after the first compile reused
the cached executable.  This probe clears jax caches between settings and
verifies retrace via a counter.

Also answers: is the fused band kernel dot-bound at all?  If default
(bf16-class) in-kernel dots do not move the wall clock, the ~2x "precision
lever" of PERF.md does not exist and the next win is elsewhere.
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _flagship_model  # noqa: E402

import vsmartmom_tpu.ops.fused_rt as FR  # noqa: E402
from vsmartmom_tpu.core import solver as SOL  # noqa: E402

TRACE_COUNT = [0]


def set_precision(prec):
    def _bmm(a, b):
        TRACE_COUNT[0] += 1
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
    FR._bmm = _bmm
    # _doubling_math/_interaction_math resolve _bmm from FR's globals at
    # call time, so this patch reaches the Pallas kernel body.


def run(prec, inputs, config, plain_R, n_rep=10):
    jax.clear_caches()
    set_precision(prec)
    TRACE_COUNT[0] = 0
    fn = jax.jit(lambda x: SOL.rt_solve(x, config)["R"])
    out = fn(inputs)
    _ = np.asarray(out)
    assert TRACE_COUNT[0] > 0, "kernel did not retrace — probe invalid"
    rel = float(np.max(np.abs(np.asarray(out) - plain_R))
                / np.max(np.abs(plain_R)))
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(inputs)
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / n_rep
    n = config.n_spec
    print(f"precision={str(prec):8s}: rel-vs-plain {rel:.2e}, "
          f"{dt*1e3:.1f} ms, {n/dt:.0f} pts/s  (retraced: "
          f"{TRACE_COUNT[0]} bmm calls)", flush=True)


def main():
    model = _flagship_model(n_spec=1024, dtype=np.float32, nstreams=8)
    inputs, config = model.build_band(0)
    plain = dataclasses.replace(config, fused=False, pack=1, m_scat=-1,
                                ns_sched=(), ns_inter=6)
    plain_R = np.asarray(jax.jit(
        lambda x: SOL.rt_solve(x, plain)["R"])(inputs))
    for prec in ("highest", "float32", None):
        run(prec, inputs, config, plain_R)


if __name__ == "__main__":
    main()
