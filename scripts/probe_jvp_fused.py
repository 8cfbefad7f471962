"""Can jax.jvp flow through the fused band kernel (pallas_call auto-JVP)?

Round-4: the scratch accumulators were replaced by output-ref accumulation
precisely because pallas's JVP rule rejects scratch_shapes.  This probe
runs a tangent through the full fused rt_solve on the real chip and
checks it against (a) the packed-XLA-path jvp and (b) central FD.
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _flagship_model  # noqa: E402
from vsmartmom_tpu.core.solver import rt_solve  # noqa: E402


def main():
    n_spec = 256
    model = _flagship_model(n_spec=n_spec, dtype=np.float32, nstreams=8)
    inputs, config = model.build_band(0)
    print("fused:", config.fused, "dot_mode:", config.dot_mode, flush=True)

    # tangent: perturb tau (a gas-VMR-scale-like direction), everything else
    # zero but INSTANTIATED (pallas jvp rejects symbolic-zero operands).
    tan = jax.tree_util.tree_map(
        lambda x: np.zeros_like(np.asarray(x)), inputs)
    tan = dataclasses.replace(
        tan, tau=np.asarray(inputs.tau).copy())

    def fn(inp, cfg):
        return rt_solve(inp, cfg)["R"]

    cfg_x = dataclasses.replace(config, fused=False)
    t0 = time.perf_counter()
    try:
        Rf, dRf = jax.jit(
            lambda i, t: jax.jvp(lambda a: fn(a, config), (i,), (t,))
        )(inputs, tan)
        _ = np.asarray(dRf)
        print(f"fused jvp OK ({time.perf_counter()-t0:.0f}s compile+run)",
              flush=True)
    except Exception as e:
        print("fused jvp FAIL:", str(e)[:500])
        return

    Rx, dRx = jax.jit(
        lambda i, t: jax.jvp(lambda a: fn(a, cfg_x), (i,), (t,))
    )(inputs, tan)
    scale = float(np.max(np.abs(np.asarray(dRx))))
    rel = float(np.max(np.abs(np.asarray(dRf) - np.asarray(dRx)))) / scale
    relR = float(np.max(np.abs(np.asarray(Rf) - np.asarray(Rx)))
                 / np.max(np.abs(np.asarray(Rx))))
    print(f"tangent parity fused-vs-XLA: {rel:.2e} (primal {relR:.2e})")

    # central FD cross-check of the fused tangent
    eps = 1e-3
    f = jax.jit(lambda i: fn(i, config))
    hi = f(dataclasses.replace(
        inputs, tau=np.asarray(inputs.tau) * (1 + eps)))
    lo = f(dataclasses.replace(
        inputs, tau=np.asarray(inputs.tau) * (1 - eps)))
    fd = (np.asarray(hi) - np.asarray(lo)) / (2 * eps)
    rel_fd = float(np.max(np.abs(fd - np.asarray(dRf)))) / scale
    print(f"tangent vs central FD: {rel_fd:.2e}")

    # timing: fused jvp vs XLA jvp (single tangent)
    for name, cfg in (("fused", config), ("xla", cfg_x)):
        g = jax.jit(lambda i, t, c=cfg: jax.jvp(
            lambda a: fn(a, c), (i,), (t,))[1])
        out = g(inputs, tan)
        _ = np.asarray(out)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = g(inputs, tan)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"jvp[{name}]: {dt*1e3:.1f} ms ({n_spec/dt:.0f} pts/s)",
              flush=True)


if __name__ == "__main__":
    main()
