"""Quantize / dequantize / requantize primitives.

Numerics are kept bit-compatible with the reference engine's scalar loops
(reference: src/quantize_utils.cc):

* asymmetric u8 activation quantization  ``q = trunc(clip(x/s + zp, 0, 255))``
  (quantize_utils.cc:3-10),
* symmetric s8 weight quantization       ``q = trunc(clip(x/s, -127, 127))``
  (quantize_utils.cc:12-19),
* int32-accumulator dequantization       ``x = q * s_a * s_w``
  (quantize_utils.cc:21-25),
* the fused requantization epilogue ``down_scale``: int32 accum -> dequant by
  ``s_a*s_w`` -> requant to the consumer's (s_c, zp_c) -> clip -> trunc -> u8
  (quantize_utils.cc:27-36).

All float->int conversions use XLA's ConvertElementType, which rounds toward
zero — exactly the C++ implicit float->integer conversion the reference relies
on.  One deliberate divergence: the reference's tensor-level ``quantize``
(quantize_utils.cc:44-52) skips clamping, which is UB for out-of-range floats
in C++; we always clamp.
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_u8(x: jnp.ndarray, scale: float, zero_point,
                rounding: str = "trunc") -> jnp.ndarray:
    """Asymmetric affine quantization float -> uint8 (activations).

    Computes in ``x``'s own float dtype (f32 normally; bf16 when a caller
    dequantized at bf16 under ``QuantConfig.glue_dtype``).  ``rounding``:
    'trunc' is the reference's C-cast; 'nearest' adds 0.5 before the
    (toward-zero, but now non-negative) cast -> round-half-up."""
    one = jnp.ones((), x.dtype)
    t = x / (one * scale) + one * zero_point
    t = jnp.clip(t, 0.0, 255.0)
    if rounding == "nearest":
        t = t + one * 0.5
    return t.astype(jnp.uint8)


def quantize_s8(x: jnp.ndarray, scale, rounding: str = "trunc") -> jnp.ndarray:
    """Symmetric quantization float -> int8 (weights / biases)."""
    t = x / scale
    if rounding == "nearest":
        t = jnp.round(t)
    t = jnp.clip(t, -127.0, 127.0)
    return t.astype(jnp.int8)


def dequantize_u8(q: jnp.ndarray, scale: float, zero_point,
                  dtype=jnp.float32) -> jnp.ndarray:
    """uint8 -> float: ``x = (q - zp) * s`` (quantize_utils.cc:38-42).

    ``dtype`` selects the compute precision (bf16 via
    ``QuantConfig.glue_dtype`` halves VPU cost on pointwise glue)."""
    one = jnp.ones((), dtype)
    return (q.astype(dtype) - one * zero_point) * (one * scale)


def dequantize_s32(acc: jnp.ndarray, scale_a: float, scale_w: float) -> jnp.ndarray:
    """int32 accumulator -> float: ``x = q * s_a * s_w``."""
    return acc.astype(jnp.float32) * jnp.float32(scale_a) * jnp.float32(scale_w)


def down_scale(
    acc: jnp.ndarray,
    scale_a: float,
    scale_w: float,
    scale_c: float,
    zp_c,
    compute_dtype=jnp.float32,
    rounding: str = "trunc",
) -> jnp.ndarray:
    """Fused requantization epilogue: s32 accum -> u8 at the consumer scale.

    ``u8 = trunc(clip(acc * s_a * s_w / s_c + zp_c, 0, 255))``
    (quantize_utils.cc:27-36).  ``scale_w`` may be a float (per-tensor) or an
    [N] array (per-channel) broadcasting over the trailing channel axis.

    ``compute_dtype=bfloat16`` halves the VPU cost of this (often
    output-size-bound) epilogue at the price of occasional +-1 output codes
    (bf16 spacing reaches 1-2 ULP near 255); gate via
    ``QuantConfig.epilogue_dtype``.
    """
    # NB: the +0.5 is emitted only under 'nearest' — a literal ``+ 0.0``
    # is NOT foldable for floats (signed-zero semantics), and an
    # unconditional add cost a full extra VPU pass inside every conv
    # epilogue fusion (AlexNet b100 lost ~10% end-to-end).
    nearest = rounding == "nearest"
    if compute_dtype == jnp.bfloat16:
        mult = (jnp.float32(scale_a) * jnp.asarray(scale_w, jnp.float32)
                / jnp.float32(scale_c)).astype(jnp.bfloat16)
        q = acc.astype(jnp.bfloat16) * mult + jnp.bfloat16(zp_c)
        q = jnp.clip(q, 0, 255)
        if nearest:
            q = q + jnp.bfloat16(0.5)
        return q.astype(jnp.uint8)
    s_w = jnp.asarray(scale_w, jnp.float32)
    deq = acc.astype(jnp.float32) * jnp.float32(scale_a) * s_w
    q = deq / jnp.float32(scale_c) + jnp.float32(zp_c)
    q = jnp.clip(q, 0.0, 255.0)
    if nearest:
        q = q + jnp.float32(0.5)
    return q.astype(jnp.uint8)


def quantize_weight_joint_scale(weight, bias, rounding: str = "trunc"):
    """Per-tensor symmetric s8 weight+bias quantization with a joint scale.

    ``scale = (max - min) / 127`` over the union of weight AND bias values
    (reference: src/layer.cc:6-26).  Bias is quantized to s8 with the same
    scale — possible only because the joint min/max bounds both tensors.

    Returns host floats/arrays suitable for freezing into layer params.
    """
    w_min = jnp.minimum(weight.min(), bias.min())
    w_max = jnp.maximum(weight.max(), bias.max())
    scale = (w_max - w_min) / 127.0
    # Degenerate all-zero layer: keep scale positive.
    scale = jnp.where(scale == 0, 1.0, scale)
    q_w = quantize_s8(weight, scale, rounding)
    q_b = quantize_s8(bias, scale, rounding)
    return q_w, q_b, float(scale)


def quantize_weight_per_channel(weight, bias, channel_axis: int = 0,
                                rounding: str = "trunc"):
    """Per-output-channel symmetric s8 scales (TPU-side extension).

    Not present in the reference; used by deeper models (ResNet) where a
    single per-tensor scale costs too much accuracy.  Bias is kept in int32
    at scale ``s_w[c]`` granularity (quantized with the per-channel scale).
    """
    reduce_axes = tuple(i for i in range(weight.ndim) if i != channel_axis)
    w_min = jnp.minimum(weight.min(axis=reduce_axes), bias)
    w_max = jnp.maximum(weight.max(axis=reduce_axes), bias)
    scale = (w_max - w_min) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    shape = [1] * weight.ndim
    shape[channel_axis] = -1
    q_w = quantize_s8(weight, scale.reshape(shape), rounding)
    q_b = quantize_s8(bias, scale, rounding)
    return q_w, q_b, scale
