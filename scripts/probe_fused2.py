"""Isolate the fused-kernel chain cost at bench shapes.

Bench full-physics work = 3 moments x 33 layers of fused_layer_step on
(512, 104, 104) packed operands. Times (a) that pure chain, (b) chain with
elemental+packing included, to locate the gap vs the full solve.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from vsmartmom_tpu.ops import fused_rt
from vsmartmom_tpu.ops.packing import pack_mat, pack_vec

SP, NP, K, NDOUBL = 512, 104, 1, 8
SCHED = (1, 1, 1, 1, 2, 2, 2, 2)
INTER = 3
NLAYER = 33
NMOM = 3


def sync(out):
    return sum(float(jnp.sum(x)) for x in jax.tree_util.tree_leaves(out))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    r = jnp.asarray(2e-4 * rng.random((SP, NP, NP)), jnp.float32)
    t = jnp.asarray(np.eye(NP)[None] * np.exp(-0.05)
                    + 2e-4 * rng.random((SP, NP, NP)), jnp.float32)
    jp = jnp.asarray(1e-3 * rng.random((SP, NP, K)), jnp.float32)
    jm = jnp.asarray(1e-3 * rng.random((SP, NP, K)), jnp.float32)
    ek = jnp.asarray(np.exp(-1e-3) * np.ones((SP, NP, K)), jnp.float32)
    d = jnp.asarray(np.ones(NP), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(NP, dtype=jnp.float32), (SP, NP, NP))
    zm = jnp.zeros((SP, NP, NP), jnp.float32)
    zv = jnp.zeros((SP, NP, K), jnp.float32)
    comp0 = (zm, zm, eye, eye, zv, zv)

    @jax.jit
    def chain(comp, r, t, jp, jm, ek):
        for _ in range(NMOM):
            c = comp
            for _ in range(NLAYER):
                c = fused_rt.fused_layer_step(
                    c, r, t, jp, jm, ek, d, NDOUBL, ns_sched=SCHED,
                    ns_inter=INTER, block=fused_rt.pick_block(SP, NP))
        return c

    dt = timeit(chain, comp0, r, t, jp, jm, ek)
    n_dots_step = sum(2 * k + 4 for k in SCHED) + (2 * INTER + 9)
    print(f"pure kernel chain ({NMOM}x{NLAYER} layers): {dt*1e3:9.1f} ms")

    # with unpacked elemental-like inputs packed per layer
    ru = jnp.asarray(2e-4 * rng.random((SP * 2, NP // 2, NP // 2)), jnp.float32)
    tu = jnp.asarray(np.eye(NP // 2)[None] * np.exp(-0.05)
                     + 2e-4 * rng.random((SP * 2, NP // 2, NP // 2)),
                     jnp.float32)
    jpu = jnp.asarray(1e-3 * rng.random((SP * 2, NP // 2, K)), jnp.float32)

    @jax.jit
    def chain_pack(comp, ru, tu, jpu, ek):
        for _ in range(NMOM):
            c = comp
            for _ in range(NLAYER):
                rp = pack_mat(ru, 2)
                tp = pack_mat(tu, 2)
                jpp = pack_vec(jpu, 2)
                c = fused_rt.fused_layer_step(
                    c, rp, tp, jpp, jpp, ek, d, NDOUBL, ns_sched=SCHED,
                    ns_inter=INTER, block=fused_rt.pick_block(SP, NP))
        return c

    dt2 = timeit(chain_pack, comp0, ru, tu, jpu, ek)
    print(f"kernel + per-layer packing:          {dt2*1e3:9.1f} ms")

    # all-ones schedule lower bound
    @jax.jit
    def chain_min(comp, r, t, jp, jm, ek):
        for _ in range(NMOM):
            c = comp
            for _ in range(NLAYER):
                c = fused_rt.fused_layer_step(
                    c, r, t, jp, jm, ek, d, NDOUBL, ns_sched=(1,) * NDOUBL,
                    ns_inter=1, block=fused_rt.pick_block(SP, NP))
        return c
    dt3 = timeit(chain_min, comp0, r, t, jp, jm, ek)
    print(f"kernel chain, NS sched all-1:        {dt3*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
