"""Functional tensor ops: relu, max_pool2d, argmax, module-level quant ops.

TPU-native equivalents of the reference's OpenMP elementwise loops
(reference: src/functional.cc).  These operate on the framework Tensor and
preserve quantization metadata exactly like the reference:

* ``relu`` on a quantized tensor clamps at the *zero_point* — quantized zero —
  and propagates (scale, zp) (functional.cc:15-26).
* ``max_pool2d`` is a window max with scale/zp pass-through; the u8 identity
  element is 0 (functional.cc:28-64).

Inside a jitted forward these fuse into neighbouring ops; the standalone
quantized GEMM kernel can also fuse relu directly into its epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..tensor import Tensor
from . import quant


# Float-domain activation definitions shared by QuantAct's FP32 path, its
# elementwise INT8 path, and its 256-entry LUT precomputation (the same jnp
# ops in all three, so the paths are bit-identical per input code).  The
# bounded ones (relu6, hard*) are MobileNetV3-era; silu/gelu are
# EfficientNet/transformer-era.  All match the torch.nn.functional function
# of the same name (gelu: exact erf form, torch's default; hard_sigmoid is
# jax.nn's relu6(x+3)/6, torch's exact definition).
ACTIVATIONS = {
    "relu": lambda x: jnp.maximum(x, 0.0),
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "hardsigmoid": jax.nn.hard_sigmoid,
    "hardswish": jax.nn.hard_swish,
    "sigmoid": jax.nn.sigmoid,
    "silu": jax.nn.silu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    # the tanh-approximate form (gemma family's gelu_pytorch_tanh)
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
}


def relu(x: Tensor) -> Tensor:
    x._no_ingest("relu")
    if x.quantized:
        out = jnp.maximum(x.data, jnp.uint8(x.zero_point))
    else:
        out = jnp.maximum(x.data, jnp.zeros((), x.data.dtype))
    return Tensor(out, x.scale, x.zero_point, _nhwc=x._nhwc,
                  _tp_sharded=x._tp_sharded)


def _pool_extra_pad(size: int, k: int, s: int, p: int) -> int:
    """Extra high-side padding emulating torch's ceil_mode=True: output
    ceil((size+2p-k)/s)+1, with the torch constraint that the last window
    must start inside the input-or-left-pad region."""
    o = -(-(size + 2 * p - k) // s) + 1
    if (o - 1) * s >= size + p:
        o -= 1
    return max(0, (o - 1) * s + k - (size + 2 * p))


def max_pool2d(x: Tensor, kernel_size: int, stride: int,
               padding: int = 0, ceil_mode: bool = False) -> Tensor:
    """NCHW-semantics window max (square window), any layout.

    ``padding`` (a ResNet-era extension; the reference pool is VALID-only,
    functional.cc:28-64) pads with the reduction identity, so padded taps
    never win the max.  ``ceil_mode`` matches torch's ceil_mode=True output
    size (SqueezeNet-era nets) via extra high-side identity padding.
    """
    x._no_ingest("max_pool2d")
    eh = ew = 0
    if ceil_mode:
        h, w = (x.data.shape[1:3]) if x._nhwc else (x.data.shape[2:4])
        eh = _pool_extra_pad(int(h), kernel_size, stride, padding)
        ew = _pool_extra_pad(int(w), kernel_size, stride, padding)
    if x._nhwc:
        window = (1, kernel_size, kernel_size, 1)
        strides = (1, stride, stride, 1)
        pads = [(0, 0), (padding, padding + eh), (padding, padding + ew),
                (0, 0)]
    else:
        window = (1, 1, kernel_size, kernel_size)
        strides = (1, 1, stride, stride)
        pads = [(0, 0), (0, 0), (padding, padding + eh),
                (padding, padding + ew)]
    if x.quantized:
        init = jnp.uint8(0)            # reference: min<u8_t>() == 0
    elif jnp.issubdtype(x.data.dtype, jnp.floating):
        init = jnp.array(-jnp.inf, x.data.dtype)
    else:
        init = jnp.array(jnp.iinfo(x.data.dtype).min, x.data.dtype)
    out = lax.reduce_window(x.data, init, lax.max, window, strides, pads)
    return Tensor(out, x.scale, x.zero_point, _nhwc=x._nhwc)


def avg_pool2d(x: Tensor, kernel_size: int, stride: int) -> Tensor:
    """Window mean. For quantized tensors the mean happens on the raw u8
    codes (affine-invariant: mean(x) = (mean(q) - zp)*s) and truncates back
    to u8 at the same (scale, zp)."""
    x._no_ingest("avg_pool2d")
    if x._nhwc:
        window = (1, kernel_size, kernel_size, 1)
        strides = (1, stride, stride, 1)
    else:
        window = (1, 1, kernel_size, kernel_size)
        strides = (1, 1, stride, stride)
    acc = lax.reduce_window(
        x.data.astype(jnp.float32), jnp.float32(0), lax.add, window, strides,
        "VALID") / float(kernel_size * kernel_size)
    out = acc.astype(x.data.dtype) if x.quantized else acc.astype(x.data.dtype)
    return Tensor(out, x.scale, x.zero_point, _nhwc=x._nhwc)


def adaptive_avg_pool2d_1x1(x: Tensor) -> Tensor:
    """Global average pool to 1x1 (ResNet head)."""
    x._no_ingest("adaptive_avg_pool2d_1x1")
    axes = (1, 2) if x._nhwc else (2, 3)
    acc = jnp.mean(x.data.astype(jnp.float32), axis=axes, keepdims=True)
    out = acc.astype(x.data.dtype)
    return Tensor(out, x.scale, x.zero_point, _nhwc=x._nhwc)


def _no_shard(x: Tensor, what: str) -> None:
    """Channel-manipulating layout ops are undefined on a shard-local
    (overlap-TP) tensor — permuting/splitting a channel shard would be
    silently wrong math, so fail loudly instead."""
    if x._tp_sharded:
        raise ValueError(
            f"{what}: input holds only a local output-channel shard "
            "(overlap tensor parallelism) — gather channels first or run "
            "this model without shard(overlap=True)")


def channel_shuffle(x: Tensor, groups: int) -> Tensor:
    """ShuffleNet's channel permutation: [.., g*k channels] -> interleave
    the g groups.  A pure layout op — quantization-transparent (scale/zp
    pass through), so it costs one relayout the XLA scheduler can usually
    fold into a neighbouring op."""
    x._no_ingest("channel_shuffle")
    _no_shard(x, "channel_shuffle")
    axis = 3 if x._nhwc else 1
    c = x.data.shape[axis]
    if c % groups:
        raise ValueError(f"channels {c} not divisible by groups {groups}")
    d = x.data
    if x._nhwc:
        n, h, w, _ = d.shape
        d = d.reshape(n, h, w, groups, c // groups)
        d = jnp.swapaxes(d, 3, 4).reshape(n, h, w, c)
    else:
        n, _, h, w = d.shape
        d = d.reshape(n, groups, c // groups, h, w)
        d = jnp.swapaxes(d, 1, 2).reshape(n, c, h, w)
    return Tensor(d, x.scale, x.zero_point, _nhwc=x._nhwc)


def split_channels(x: Tensor, sections: int):
    """Split the channel axis into ``sections`` equal parts (ShuffleNetV2's
    channel split).  Each part keeps the input's (scale, zp)."""
    x._no_ingest("split_channels")
    _no_shard(x, "split_channels")
    axis = 3 if x._nhwc else 1
    c = x.data.shape[axis]
    if c % sections:
        raise ValueError(f"channels {c} not divisible into {sections} parts")
    parts = jnp.split(x.data, sections, axis=axis)
    return tuple(Tensor(p, x.scale, x.zero_point, _nhwc=x._nhwc)
                 for p in parts)


def to_tokens(x: Tensor) -> Tensor:
    """Image feature map -> token sequence [B, H*W, C] (ViT patch stem).

    TPU-first detail: the conv output is already NHWC internally, which IS
    token-major — this is a free reshape, no transpose (an NCHW-internal
    engine would pay one here)."""
    x._no_ingest("to_tokens")
    _no_shard(x, "to_tokens")
    if x._nhwc:
        n, h, w, c = x.data.shape
        d = x.data.reshape(n, h * w, c)
    else:
        n, c, h, w = x.data.shape
        d = jnp.transpose(x.data, (0, 2, 3, 1)).reshape(n, h * w, c)
    return Tensor(d, x.scale, x.zero_point)


def split_heads(x: Tensor, num_heads: int) -> Tensor:
    """[B, T, C] -> [B, H, T, C/H] (quantization-transparent layout op).

    ``num_heads`` is always the model's GLOBAL head count.  On a
    channel-sharded input (head-parallel attention TP: a column-parallel
    QKV projection kept its output sharded), the local channels hold
    ``num_heads / model_size`` whole heads — contiguous output-channel
    shards align to head boundaries exactly when heads divide the model
    axis, which parallel/sharding.py enforces before assigning the role.
    """
    x._no_ingest("split_heads")
    heads = num_heads
    if x._tp_sharded:
        from ..parallel.context import current_axes
        pa = current_axes()
        if pa is None or pa.model_size <= 1:
            _no_shard(x, "split_heads")
        elif num_heads % pa.model_size:
            raise ValueError(
                f"split_heads on a channel shard: {num_heads} heads do "
                f"not divide the model axis ({pa.model_size})")
        else:
            heads = num_heads // pa.model_size
    b, t, c = x.data.shape
    if c % heads:
        raise ValueError(f"dim {c} not divisible by heads {heads}")
    d = x.data.reshape(b, t, heads, c // heads)
    return Tensor(jnp.transpose(d, (0, 2, 1, 3)), x.scale, x.zero_point,
                  _tp_sharded=x._tp_sharded)


def repeat_kv(x: Tensor, group: int) -> Tensor:
    """[B, Hkv, T, D] -> [B, Hkv*group, T, D]: expand grouped-query kv
    heads so each query head h sees kv head h // group (llama-family
    GQA, repeat-interleave order).  Quantization-transparent (u8 codes
    are copied, scale/zp unchanged); used on the PREFILL path only — the
    decode path keeps the cache kv-compact (ops/attention.py grouped
    matmul).  Exact on a local head shard under TP (whole kv groups per
    shard when kv_heads divide the model axis)."""
    x._no_ingest("repeat_kv")
    if group == 1:
        return x
    b, hkv, t, d = x.data.shape
    out = jnp.broadcast_to(x.data[:, :, None], (b, hkv, group, t, d))
    return Tensor(out.reshape(b, hkv * group, t, d), x.scale,
                  x.zero_point, _tp_sharded=x._tp_sharded)


def merge_heads(x: Tensor) -> Tensor:
    """[B, H, T, D] -> [B, T, H*D] (inverse of split_heads; on a local
    head shard the merged channels stay a local channel shard)."""
    x._no_ingest("merge_heads")
    b, h, t, d = x.data.shape
    out = jnp.transpose(x.data, (0, 2, 1, 3)).reshape(b, t, h * d)
    return Tensor(out, x.scale, x.zero_point, _tp_sharded=x._tp_sharded)


def select_token(x: Tensor, index: int) -> Tensor:
    """[B, T, C] -> [B, C]: pick one token (e.g. cls at 0) for the head."""
    x._no_ingest("select_token")
    _no_shard(x, "select_token")
    return Tensor(x.data[:, index, :], x.scale, x.zero_point)


def argmax(x: Tensor, *args, **kwargs) -> Tensor:
    """Matches i8ie.argmax — numpy semantics, float32 result tensor
    (reference: i8ie/__init__.py:17-18)."""
    res = x.numpy().argmax(*args, **kwargs)
    return Tensor(jnp.asarray(np.float32(res)))


def quantize(x: Tensor, scale: float, zero_point: int,
             rounding: str = "trunc") -> Tensor:
    """Module-level asymmetric u8 quantization (i8ie/__init__.py:29-30)."""
    x._no_ingest("quantize")
    q = quant.quantize_u8(x.data, scale, zero_point, rounding)
    return Tensor(q, scale, zero_point, _nhwc=x._nhwc)


def dequantize(x: Tensor) -> Tensor:
    """u8 -> f32 using the tensor's own (scale, zp) (i8ie/__init__.py:31-32)."""
    x._no_ingest("dequantize")
    out = quant.dequantize_u8(x.data, x.scale, x.zero_point)
    return Tensor(out, _nhwc=x._nhwc, _tp_sharded=x._tp_sharded)
