"""Bisect which part of the fused_band kernel crashes the Mosaic compiler.

Stages:
  acc    grid accumulator: scratch carry over z with pl.when init/emit
  elem   elemental assembly (iota geometry, expm1 series, where)
  src    + solar source rows
  pack   + block-diagonal packing by concatenation
  dbl    + doubling ladder (_doubling_math)
  full   + interaction (_interaction_math)
"""
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsmartmom_tpu.ops.fused_rt import _doubling_math, _interaction_math

N, S, NZ = 12, 32, 4
PACK = 2


def kernel(stage, tau_ref, Em1_ref, aux_ref, out_ref, acc_ref):
    z = pl.program_id(0)
    b = tau_ref.shape[-1]
    dtype = tau_ref.dtype

    @pl.when(z == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tau = tau_ref[0, 0]
    Em1 = Em1_ref[0]
    qp = aux_ref[0]
    wct = aux_ref[1]

    if stage == "acc":
        val = jnp.broadcast_to(tau[:, None, None], (b, N, N)) + 0.0 * Em1[:, :, None]
    else:
        mu_i = qp[:, None]
        mu_j = qp[None, :]
        r_geom = (mu_j / (mu_i + mu_j)) * wct[None, :]
        one_m_EE = -(Em1[:, :, None] + Em1[:, None, :]
                     + Em1[:, :, None] * Em1[:, None, :])
        r_mp = r_geom[None] * one_m_EE
        same_mu = jnp.abs(mu_i - mu_j) <= 1e-9 * jnp.maximum(mu_i, mu_j)
        delta = jnp.where(same_mu, 1.0, mu_i - mu_j)
        dt3 = (tau / 16.0)[:, None, None]
        series = dt3 * (delta / (mu_i * mu_j))[None]
        ratio = (jnp.exp(series) - 1.0) / delta[None]
        t_off = (mu_j * wct[None, :])[None] * (1.0 + Em1[:, None, :]) * ratio
        rows = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        beer = (1.0 + Em1[:, :, None]) * (rows == cols).astype(dtype)[None]
        t_pp = jnp.where(same_mu[None], t_off + beer, t_off)
        val = r_mp

        if stage in ("src", "pack", "dbl", "full"):
            j0 = r_mp[:, :, :1]  # (b, N, 1) source stand-in
            ek = jnp.broadcast_to(tau[:, None, None], (b, N, 1))
        if stage in ("pack", "dbl", "full"):
            bp = b // PACK
            Np = PACK * N

            def blockdiag(x):
                x4 = x.reshape(bp, PACK, N, N)
                zero = jnp.zeros((bp, N, N), dtype)
                rws = []
                for q in range(PACK):
                    cls = [zero] * PACK
                    cls[q] = x4[:, q]
                    rws.append(jnp.concatenate(cls, axis=2))
                return jnp.concatenate(rws, axis=1)

            rp = blockdiag(r_mp)
            tp = blockdiag(t_pp)
            jpp = j0.reshape(bp, Np, 1)
            ekp = ek.reshape(bp, Np, 1)
            val = rp
        if stage in ("dbl", "full"):
            r, t, jp_v, jm_v = _doubling_math(rp, tp, jpp, jpp, ekp,
                                              (1, 1, 2, 2))
            val = r
        if stage == "full":
            out = _interaction_math(acc_ref[:], acc_ref[:],
                                    acc_ref[:] * 0 + 1.0, acc_ref[:] * 0 + 1.0,
                                    acc_ref[:, :, :1], acc_ref[:, :, :1],
                                    r, r, t, t, jp_v, jm_v, 3)
            val = out[0]

    if stage in ("pack", "dbl", "full"):
        acc_ref[:] = val
    else:
        # unpacked stages accumulate on raw (b, N, N) — reuse packed scratch
        acc_ref[:] = acc_ref[:] * 0.0 + jnp.sum(val)

    @pl.when(z == NZ - 1)
    def _emit():
        out_ref[:] = acc_ref[:]


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "acc"
    rng = np.random.default_rng(0)
    bp, Np = S // PACK, PACK * N
    tau = jnp.asarray(rng.uniform(0.01, 0.5, (NZ, 1, S)), jnp.float32)
    Em1 = jnp.asarray(np.expm1(-rng.uniform(0, 1, (NZ, S, N))), jnp.float32)
    aux = jnp.asarray(rng.uniform(0.2, 1.0, (8, N)), jnp.float32)

    fn = pl.pallas_call(
        partial(kernel, stage),
        grid=(NZ,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda z: (z, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, N), lambda z: (z, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, N), lambda z: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, Np, Np), lambda z: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, Np, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bp, Np, Np), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    out = fn(tau, Em1, aux)
    print(stage, "OK", float(jnp.sum(out)))


if __name__ == "__main__":
    main()
