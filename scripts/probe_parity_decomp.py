"""Decompose the bench parity gap: which knob moves the TPU result?

Compares rt_solve R at nSpec=256 across configs, all vs the plain path:
  plain:   fused=False pack=1 m_scat=-1 ns_sched=() ns_inter=6
  packed:  pack=2 only
  msplit:  + m_scat
  sched:   + ns_sched/ns_inter (packed XLA path)
  band:    fused=True (whole-moment Pallas kernel)
"""
import dataclasses
import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _flagship_model  # noqa: E402

from vsmartmom_tpu.core.solver import rt_solve  # noqa: E402


def main():
    model = _flagship_model(n_spec=256, dtype=np.float32, nstreams=8)
    inputs, config = model.build_band(0)
    print(f"# config: pack={config.pack} fused={config.fused} "
          f"m_scat={config.m_scat} ns_sched={config.ns_sched} "
          f"ns_inter={config.ns_inter} ndoubl={config.ndoubl}", flush=True)

    plain = dataclasses.replace(config, fused=False, pack=1, m_scat=-1,
                                ns_sched=(), ns_inter=6)
    cases = {
        "packed": dataclasses.replace(plain, pack=config.pack),
        "msplit": dataclasses.replace(plain, pack=config.pack,
                                      m_scat=config.m_scat),
        "sched": dataclasses.replace(plain, pack=config.pack,
                                     m_scat=config.m_scat,
                                     ns_sched=config.ns_sched,
                                     ns_inter=config.ns_inter),
        "band": config,
    }
    ref = np.asarray(jax.jit(lambda x: rt_solve(x, plain)["R"])(inputs))
    scale = np.max(np.abs(ref))
    print(f"plain max|R| = {scale:.6f}", flush=True)
    for name, cfg in cases.items():
        out = np.asarray(jax.jit(lambda x: rt_solve(x, cfg)["R"])(inputs))
        rel = np.max(np.abs(out - ref)) / scale
        print(f"{name:8s} rel max diff vs plain: {rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
