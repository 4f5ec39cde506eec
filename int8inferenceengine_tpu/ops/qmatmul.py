"""Quantized activation x activation batched matmul (attention GEMMs).

The reference engine only ever multiplies activations by *weights*
(src/fully_connected.cc, src/conv2d.cc) — its offset vector ``oc`` can be
precomputed at convert time because the weight rowsums are static.
Attention needs ``QK^T`` and ``P@V`` where BOTH operands are quantized
activations, so the zero-point correction involves data-dependent row/column
sums computed on device (cheap VPU reductions next to an MXU dot).

Math (both operands recentered u8 -> s8 exactly, a' = a - 128):

    sum_k (a-zp_a)(b-zp_b)
      = sum_k a'b'                                (int8 MXU dot)
      + (128-zp_b) * rowsum_a[m]                  (VPU reduction over K)
      + (128-zp_a) * colsum_b[n]
      + K * (128-zp_a)(128-zp_b)                  (static)

followed by the same fused requant epilogue as qgemm
(quantize_utils.cc:27-36 semantics): ``u8 = trunc(clip(acc * s_a*s_b*alpha
/ s_c + zp_c, 0, 255))``, with ``alpha`` folding the attention's 1/sqrt(d)
into the (static) multiplier for free.

Everything is exact integer arithmetic up to the epilogue, so this path is
bit-stable across backends; on TPU, XLA lowers the s8xs8 batched
dot_general onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def qmatmul_act(a_u8, b_u8, *, scale_a, zp_a, scale_b, zp_b,
                scale_c, zp_c, alpha: float = 1.0,
                transpose_b: bool = False, rounding: str = "trunc"):
    """u8[..., M, K] x u8[..., K, N] (or [..., N, K] with transpose_b)
    -> u8[..., M, N] requantized to (scale_c, zp_c).

    Leading dims are batch dims (shared by both operands).
    """
    if a_u8.dtype != jnp.uint8 or b_u8.dtype != jnp.uint8:
        raise TypeError(
            f"qmatmul_act operands must be uint8 codes, got "
            f"{a_u8.dtype} x {b_u8.dtype}")
    nb = a_u8.ndim - 2
    k = a_u8.shape[-1]
    a = (a_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    b = (b_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    batch_dims = tuple(range(nb))
    ca, cb = 128 - int(zp_a), 128 - int(zp_b)
    ride_rowsum = cb != 0 and not transpose_b
    b_dot = b
    if ride_rowsum:
        # Ride a's rowsum on the MXU instead of a standalone VPU reduce:
        # append a ones column to b (s8 value 1), so output column N holds
        # sum_k a'[m,k].  For P@V the reduce runs over the [B,H,T,T]
        # probability tensor — the augmented-dot column is ~free while the
        # reduce pass cost 0.125 ms/layer on ViT-Tiny b128.
        ones_col = jnp.ones((*b.shape[:-1], 1), jnp.int8)
        b_dot = jnp.concatenate([b, ones_col], axis=-1)
    if transpose_b:
        dn = (((nb + 1,), (nb + 1,)), (batch_dims, batch_dims))
        b_k_axis = -1
    else:
        dn = (((nb + 1,), (nb,)), (batch_dims, batch_dims))
        b_k_axis = -2
    acc = lax.dot_general(a, b_dot, dn, preferred_element_type=jnp.int32)
    if ride_rowsum:
        acc, rowsum_a = acc[..., :-1], acc[..., -1:]
        acc = acc + cb * rowsum_a
    elif cb:
        acc = acc + cb * jnp.sum(a.astype(jnp.int32), axis=-1,
                                 keepdims=True)
    if ca:
        cs_b = jnp.sum(b.astype(jnp.int32), axis=b_k_axis)
        acc = acc + ca * cs_b[..., None, :]
    acc = acc + k * ca * cb
    mult = (jnp.float32(scale_a) * jnp.float32(scale_b)
            * jnp.float32(alpha) / jnp.float32(scale_c))
    q = acc.astype(jnp.float32) * mult + jnp.float32(zp_c)
    q = jnp.clip(q, 0.0, 255.0)
    if rounding == "nearest":
        q = q + jnp.float32(0.5)
    return q.astype(jnp.int32).astype(jnp.uint8)
