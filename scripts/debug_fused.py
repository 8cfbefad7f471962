"""Debug NaN in fused Pallas kernels on real TPU: test each piece."""
import jax
import jax.numpy as jnp
import numpy as np

from vsmartmom_tpu.core.kernels import (CompositeLayer, doubling, interaction)
from vsmartmom_tpu.ops import fused_rt

s, N, K, ndoubl = 64, 52, 1, 4
rng = np.random.default_rng(0)
r = jnp.asarray(1e-3 * rng.random((s, N, N)), jnp.float32)
t = jnp.asarray(np.eye(N)[None] * np.exp(-1e-3) + 1e-3 * rng.random((s, N, N)), jnp.float32)
jp = jnp.asarray(1e-3 * rng.random((s, N, K)), jnp.float32)
jm = jnp.asarray(1e-3 * rng.random((s, N, K)), jnp.float32)
ek = jnp.asarray(np.exp(-1e-3 / 0.7) * np.ones((s, K)), jnp.float32)
d_vec = np.ones(N)
for q in range(N // 4):
    d_vec[q * 4 + 2:q * 4 + 4] = -1.0
d_vec = jnp.asarray(d_vec, jnp.float32)

r_star = r * d_vec[None, :, None]
jm_star = jm * d_vec[None, :, None]

# 1. fused_doubling vs kernels.doubling
out_f = jax.jit(lambda *a: fused_rt.fused_doubling(*a, ndoubl))(r_star, t, jp, jm_star, ek)
add_x = jax.jit(lambda *a: doubling(*a, ndoubl, d_vec))(r, t, jp, jm, ek)
# starred r back: add_x.r_mp * d -> starred
rs_x = add_x.r_mp * d_vec[None, :, None]
jm_x = add_x.j0_m * d_vec[None, :, None]
for name, a, b in [("r*", out_f[0], rs_x), ("t", out_f[1], add_x.t_pp),
                   ("jp", out_f[2], add_x.j0_p), ("jm*", out_f[3], jm_x)]:
    a, b = np.asarray(a), np.asarray(b)
    print(f"fused_doubling {name}: nan_f={np.isnan(a).sum()} "
          f"maxrel={np.max(np.abs(a-b))/ (np.max(np.abs(b))+1e-30):.2e}")

# 2. fused_layer_step vs XLA layer
eye = jnp.broadcast_to(jnp.eye(N, dtype=r.dtype), (s, N, N))
zm = jnp.zeros((s, N, N), r.dtype)
zv = jnp.zeros((s, N, K), r.dtype)
comp0 = CompositeLayer(zm, zm, eye, eye, zv, zv)
comp_x = jax.jit(lambda c, *a: interaction(c, doubling(*a, ndoubl, d_vec)))(comp0, r, t, jp, jm, ek)
comp_f = jax.jit(lambda c, *a: fused_rt.fused_layer_step(tuple(c), *a, d_vec, ndoubl))(
    comp0, r_star, t, jp, jm_star, ek)
for name, a, b in zip(CompositeLayer._fields, comp_f, comp_x):
    a, b = np.asarray(a), np.asarray(b)
    print(f"fused_layer {name}: nan={np.isnan(a).sum()} "
          f"maxrel={np.max(np.abs(a-b))/(np.max(np.abs(b))+1e-30):.2e}")
