"""Empirically determine which shape casts/broadcasts Mosaic supports here.

Each case is a tiny one-block pallas_call; prints OK/FAIL per case.
"""
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N = 32, 24


def run(name, kernel, in_shapes, out_shape):
    try:
        fn = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(s, lambda: tuple([0] * len(s)),
                                   memory_space=pltpu.VMEM)
                      for s in in_shapes],
            out_specs=pl.BlockSpec(out_shape, lambda: tuple([0] * len(out_shape)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )
        args = [jnp.asarray(np.random.rand(*s), jnp.float32)
                for s in in_shapes]
        out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name:28s} OK")
    except Exception as e:
        msg = str(e).split("\n")[0][:90]
        print(f"{name:28s} FAIL {msg}")


def main():
    # (a) squeeze leading singleton of a 3D block
    run("squeeze_lead [0]",
        lambda x, o: o.__setitem__(slice(None), x[...][0]),
        [(1, B, N)], (B, N))
    # (b) trailing expand 2D -> 3D  x[...][:, :, None]
    run("expand_trail [:,:,None]",
        lambda x, o: o.__setitem__(slice(None), x[...][:, :, None] + jnp.zeros((B, N, N))),
        [(B, N)], (B, N, N))
    # (c) middle expand 2D -> 3D  x[...][:, None, :]
    run("expand_mid [:,None,:]",
        lambda x, o: o.__setitem__(slice(None), x[...][:, None, :] + jnp.zeros((B, N, N))),
        [(B, N)], (B, N, N))
    # (d) broadcast_in_dim (0,2): col-broadcast
    run("bcast_in_dim (0,2)",
        lambda x, o: o.__setitem__(slice(None), jax.lax.broadcast_in_dim(x[...], (B, N, N), (0, 2))),
        [(B, N)], (B, N, N))
    # (e) broadcast_in_dim (0,1): row-broadcast
    run("bcast_in_dim (0,1)",
        lambda x, o: o.__setitem__(slice(None), jax.lax.broadcast_in_dim(x[...], (B, N, N), (0, 1))),
        [(B, N)], (B, N, N))
    # (f) 1D -> 3D scalar rows  t[:, None, None]
    run("1d->3d [:,None,None]",
        lambda x, o: o.__setitem__(slice(None), x[...][:, None, None] + jnp.zeros((B, N, N))),
        [(B,)], (B, N, N))
    # (g) 3D reshape merge lead (B,N,N)->(B*N,N)
    run("reshape merge lead",
        lambda x, o: o.__setitem__(slice(None), x[...].reshape(B * N, N)),
        [(B, N, N)], (B * N, N))
    # (h) 3D reshape split lead (B,N,N) -> (B//2,2,N,N)
    run("reshape split lead",
        lambda x, o: o.__setitem__(slice(None), x[...].reshape(B // 2, 2, N, N)),
        [(B, N, N)], (B // 2, 2, N, N))
    # (i) concat minor axis
    run("concat axis=-1",
        lambda x, y, o: o.__setitem__(slice(None), jnp.concatenate([x[...], y[...]], axis=2)),
        [(B, N, N), (B, N, N)], (B, N, 2 * N))
    # (j) concat middle axis
    run("concat axis=1",
        lambda x, y, o: o.__setitem__(slice(None), jnp.concatenate([x[...], y[...]], axis=1)),
        [(B, N, N), (B, N, N)], (B, 2 * N, N))
    # (k) 2D iota + compare
    run("iota2d+eq",
        lambda x, o: o.__setitem__(slice(None), x[...] + (jax.lax.broadcasted_iota(jnp.int32, (B, N, N), 1)
             == jax.lax.broadcasted_iota(jnp.int32, (B, N, N), 2)).astype(jnp.float32)),
        [(B, N, N)], (B, N, N))
    # (l) 2D slice of 3D block on minor dim
    run("slice minor x[:, :, :4]",
        lambda x, o: o.__setitem__(slice(None), x[...][:, :, :4]),
        [(B, N, N)], (B, N, 4))
    # (m) batched dot_general
    run("batched dot",
        lambda x, y, o: o.__setitem__(slice(None), jnp.einsum("bij,bjk->bik", x[...], y[...])),
        [(B, N, N), (B, N, N)], (B, N, N))
    # (n) outer product rank-1 dot (B,N,1)x(B,1,N)
    run("outer via dot",
        lambda x, y, o: o.__setitem__(slice(None), jnp.einsum("bi,bj->bij", x[...], y[...])),
        [(B, N), (B, N)], (B, N, N))
    # (o) sum reduce minor then broadcast back
    run("reduce minor keepdims",
        lambda x, o: o.__setitem__(slice(None), x[...] - jnp.sum(x[...], axis=2, keepdims=True)),
        [(B, N, N)], (B, N, N))
    # (p) transpose last two dims
    run("transpose minor",
        lambda x, o: o.__setitem__(slice(None), jnp.swapaxes(x[...], 1, 2)),
        [(B, N, N)], (B, N, N))


if __name__ == "__main__":
    main()
