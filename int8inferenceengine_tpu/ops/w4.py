"""INT4 grouped weight-only storage (W4): packed nibbles + per-group scales.

The LLM-serving weight format beyond W8: weights quantize to symmetric
4-bit codes with one scale per GROUP of input channels (default 128), so
the dynamic-range cost of 4 bits is paid per 128 weights instead of per
tensor.  Two codes pack per byte — 8x less weight HBM traffic than f32,
2x less than W8 — which is what memory-bound decode is bound by.

Storage layout (Linear weight [N, K], K even):

    codes  = clip(round(w / s_g), -7, 7) + 8     in [1, 15], 0 unused
    packed = codes[:, 0::2] << 4 | codes[:, 1::2]      u8 [N, K//2]
    scales = max|w_group| / 7                          f32 [N, K//g]

Dequantization is a handful of elementwise bit ops + one multiply;
``w4_matmul_xla`` is the portable reference path (dequantize then dot —
XLA fuses the unpack into the materialized operand).  A Pallas kernel
that unpacks in VMEM next to the MXU is the round-2 fast path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["pack_w4", "dequant_w4", "w4_matmul_xla"]


def pack_w4(w, group: int = 128, optimize: bool = False):
    """Float [N, K] -> (packed u8 [N, K//2], scales f32 [N, K//group]).

    K must be divisible by 2; the last group may be short (K % group).
    ``optimize=True`` grid-searches each group's scale for minimum
    reconstruction MSE instead of max/7 — at 4 bits the grid is coarse
    enough that clipping the group tail for finer bulk codes genuinely
    pays (unlike 8-bit grids, where minmax is near-optimal).
    """
    w = jnp.asarray(w, jnp.float32)
    n, k = w.shape
    if k % 2:
        raise ValueError(f"W4 packing needs even K, got {k}")
    g = min(group, k)
    n_groups = -(-k // g)
    pad = n_groups * g - k
    wp = jnp.pad(w, ((0, 0), (0, pad)))
    wg = wp.reshape(n, n_groups, g)
    scales = jnp.maximum(jnp.max(jnp.abs(wg), axis=2), 1e-8) / 7.0
    if optimize:
        cands = jnp.linspace(0.55, 1.0, 10)
        s_c = scales[None, :, :, None] * cands[:, None, None, None]
        q = jnp.clip(jnp.round(wg[None] / s_c), -7, 7)
        err = jnp.sum(jnp.square(q * s_c - wg[None]), axis=3)  # [C, N, G]
        best = jnp.argmin(err, axis=0)                          # [N, G]
        scales = scales * cands[best]
    codes = jnp.clip(jnp.round(wg / scales[:, :, None]), -7, 7) + 8
    codes = codes.reshape(n, n_groups * g)[:, :k].astype(jnp.uint8)
    packed = (codes[:, 0::2] << 4) | codes[:, 1::2]
    return packed, scales.astype(jnp.float32)


def dequant_w4(packed, scales, k: int, group: int = 128):
    """(packed, scales) -> float32 [N, K]."""
    n = packed.shape[0]
    g = min(group, k)
    hi = (packed >> 4).astype(jnp.int32) - 8
    lo = (packed & jnp.uint8(0x0F)).astype(jnp.int32) - 8
    codes = jnp.stack([hi, lo], axis=2).reshape(n, -1)[:, :k]
    n_groups = scales.shape[1]
    pad = n_groups * g - k
    cp = jnp.pad(codes, ((0, 0), (0, pad)))
    w = (cp.reshape(n, n_groups, g).astype(jnp.float32)
         * scales[:, :, None])
    return w.reshape(n, n_groups * g)[:, :k]


def w4_matmul_xla(x, packed, scales, bias, k: int, group: int = 128):
    """x [M, K] @ W^T + bias with W stored as packed W4."""
    w = dequant_w4(packed, scales, k, group)
    return (jnp.dot(x, w.T, preferred_element_type=jnp.float32)
            + bias.reshape(1, -1))
