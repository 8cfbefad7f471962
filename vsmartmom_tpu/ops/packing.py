"""Block-diagonal spectral packing for batched small-matrix chains.

The TPU MXU is a 128x128 systolic array; a batched GEMM over (s, N, N)
operands with N ~ 12-64 pads each matrix to a full tile and wastes
(1 - (N/128)^2) of every pass (measured: the N=52 solver chain runs at
~2.4 TF/s on a 197 TF/s v5e — exactly the padding model's prediction).

Packing p = floor(128/N) spectral points into one block-diagonal
(pN, pN) operator lifts tile utilization by ~p^2 while leaving the
adding-doubling algebra untouched: block-diagonal matrices are closed
under +, @, and inverse, and stacked source vectors multiply correctly
(blockdiag(A_1..A_p) @ vstack(x_1..x_p) = vstack(A_1 x_1..A_p x_p)).
This is a TPU-native trick with no reference equivalent (CUBLAS batched
GEMM has no tile-padding problem at these sizes).

Conventions: pack groups CONSECUTIVE spectral points — point s*p + q goes
to diagonal block q of packed batch element s — so vector (s, N, K) packing
is a free reshape to (s/p, pN, K).
"""

import jax.numpy as jnp


def pack_mat(x, p: int):
    """(s, N, N) -> (s/p, pN, pN) block-diagonal. p must divide s."""
    if p == 1:
        return x
    s, N, _ = x.shape
    assert s % p == 0, (s, p)
    xr = x.reshape(s // p, p, N, N)
    out = jnp.zeros((s // p, p * N, p * N), x.dtype)
    for q in range(p):
        out = out.at[:, q * N:(q + 1) * N, q * N:(q + 1) * N].set(xr[:, q])
    return out


def unpack_mat(x, p: int):
    """(s/p, pN, pN) block-diagonal -> (s, N, N) (drops off-blocks)."""
    if p == 1:
        return x
    sp, pN, _ = x.shape
    N = pN // p
    blocks = [x[:, q * N:(q + 1) * N, q * N:(q + 1) * N] for q in range(p)]
    return jnp.stack(blocks, axis=1).reshape(sp * p, N, N)


def pack_vec(x, p: int):
    """(s, N, K) stacked sources -> (s/p, pN, K): a free reshape."""
    if p == 1:
        return x
    s, N, K = x.shape
    assert s % p == 0, (s, p)
    return x.reshape(s // p, p * N, K)


def unpack_vec(x, p: int):
    """(s/p, pN, K) -> (s, N, K): a free reshape."""
    if p == 1:
        return x
    sp, pN, K = x.shape
    return x.reshape(sp * p, pN // p, K)


def pick_pack(N: int, n_spec: int, max_pack: int | None = None) -> int:
    """Pack factor: largest p with pN <= 128 and p | n_spec.

    Each batched small matmul costs one full padded MXU tile pass, so
    utilization is ~pN^3/128^3 — linear in p — until pN exceeds 128 lanes
    and the operand spans multiple tiles.
    """
    p = max(1, 128 // max(N, 1))
    if max_pack is not None:
        p = min(p, max_pack)
    while p > 1 and n_spec % p != 0:
        p -= 1
    return p
