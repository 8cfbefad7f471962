"""Measure dot_mode=split3 (manual 3-pass bf16 splitting) on the real solve:
parity vs the plain XLA path and sustained throughput at bench shapes."""
import dataclasses
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _flagship_model  # noqa: E402
from vsmartmom_tpu.core.solver import rt_solve  # noqa: E402


def main():
    model = _flagship_model(n_spec=1024, dtype=np.float32, nstreams=8)
    inputs, config = model.build_band(0)
    plain = dataclasses.replace(config, fused=False, pack=1, m_scat=-1,
                                ns_sched=(), ns_inter=6)
    plain_R = np.asarray(jax.jit(
        lambda x: rt_solve(x, plain)["R"])(inputs))

    for mode in ("split3d", "mixY/split3"):
        cfg = dataclasses.replace(config, dot_mode=mode)
        fn = jax.jit(lambda x, c=cfg: rt_solve(x, c)["R"])
        out = fn(inputs)
        rel = float(np.max(np.abs(np.asarray(out) - plain_R))
                    / np.max(np.abs(plain_R)))
        n_rep = 10
        t0 = time.perf_counter()
        for _ in range(n_rep):
            out = fn(inputs)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / n_rep
        print(f"dot_mode={mode:8s}: rel-vs-plain {rel:.2e}, "
              f"{dt*1e3:.1f} ms, {config.n_spec/dt:.0f} pts/s", flush=True)


if __name__ == "__main__":
    main()
