"""TPU probe: fused Pallas layer step vs the XLA doubling+interaction path.

Times one full layer step (doubling ladder + interaction) at bench-like
shapes and checks values against the XLA path.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vsmartmom_tpu.core.kernels import (AddedLayer, CompositeLayer, doubling,
                                        interaction)
from vsmartmom_tpu.ops import fused_rt


def make_inputs(s, N, K, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    # Physically-plausible magnitudes: thin-slab reflections ~1e-3.
    r = 1e-3 * rng.random((s, N, N))
    t = np.eye(N)[None] * np.exp(-1e-3) + 1e-3 * rng.random((s, N, N))
    jp = 1e-3 * rng.random((s, N, K))
    jm = 1e-3 * rng.random((s, N, K))
    ek = np.exp(-1e-3 / 0.7) * np.ones((s, K))
    d_vec = np.ones(N)
    nst = 4
    for q in range(N // nst):
        d_vec[q * nst + 2:q * nst + 4] = -1.0
    return tuple(jnp.asarray(a, dtype) for a in (r, t, jp, jm, ek, d_vec))


def xla_layer(comp, r, t, jp, jm, ek, d_vec, ndoubl):
    # kernels.doubling takes UNSTARRED r_mp/j0_m.
    add = doubling(r, t, jp, jm, ek, ndoubl, d_vec)
    return interaction(CompositeLayer(*comp), add)


def fused_layer(comp, r, t, jp, jm, ek, d_vec, ndoubl, block):
    r_star = r * d_vec[None, :, None]
    jm_star = jm * d_vec[None, :, None]
    return fused_rt.fused_layer_step(comp, r_star, t, jp, jm_star, ek,
                                     d_vec, ndoubl, block=block)


def sync(out):
    """Force a real device->host readback (block_until_ready is unreliable
    under the axon relay — round-1 VERDICT finding)."""
    return sum(float(jnp.sum(x)) for x in jax.tree_util.tree_leaves(out))


def bench(fn, args, reps=5):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    s, N, K, ndoubl = 4096, 52, 1, 8
    print("device:", jax.devices()[0].device_kind)
    r, t, jp, jm, ek, d_vec = make_inputs(s, N, K)
    eye = jnp.broadcast_to(jnp.eye(N, dtype=r.dtype), (s, N, N))
    zm = jnp.zeros((s, N, N), r.dtype)
    zv = jnp.zeros((s, N, K), r.dtype)
    # Non-trivial composite (result of a previous layer) — built under jit
    # (eager op-by-op dispatch through the axon relay is minutes-slow).
    comp0 = tuple(jax.jit(lambda *a: tuple(xla_layer(*a, ndoubl)))(
        (zm, zm, eye, eye, zv, zv), r, t, jp, jm, ek, d_vec))

    n_layers = 4  # chain several layer steps for a realistic measurement

    @jax.jit
    def xla_chain(comp, r, t, jp, jm, ek, d_vec):
        for _ in range(n_layers):
            comp = tuple(xla_layer(comp, r, t, jp, jm, ek, d_vec, ndoubl))
        return comp

    dt_x, out_x = bench(xla_chain, (comp0, r, t, jp, jm, ek, d_vec))
    print(f"XLA   chain({n_layers} layers): {dt_x*1e3:9.2f} ms")

    for block in (16, 32, 64):
        try:
            @jax.jit
            def fused_chain(comp, r, t, jp, jm, ek, d_vec, block=block):
                for _ in range(n_layers):
                    comp = fused_layer(comp, r, t, jp, jm, ek, d_vec,
                                       ndoubl, block)
                return comp

            dt_f, out_f = bench(fused_chain, (comp0, r, t, jp, jm, ek, d_vec))
            errs = [float(jnp.max(jnp.abs(a - b)) /
                          (jnp.max(jnp.abs(b)) + 1e-30))
                    for a, b in zip(out_f, out_x)]
            print(f"Pallas block={block:3d}: {dt_f*1e3:9.2f} ms  "
                  f"speedup {dt_x/dt_f:6.2f}x  max rel err {max(errs):.2e}")
        except Exception as e:
            print(f"Pallas block={block:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
