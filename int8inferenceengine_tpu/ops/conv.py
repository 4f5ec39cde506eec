"""Convolution paths: FP32 XLA conv, INT8 XLA conv, INT8 im2col + Pallas GEMM.

The reference implements conv as per-sample im2col + MKL GEMM under OpenMP
(reference: src/conv2d.cc:34-49 im2col, :63-98 FP32, :100-142 INT8).  On TPU
the convolution itself belongs on the MXU; we provide:

* ``conv2d_fp32``      — ``lax.conv_general_dilated`` in NHWC (XLA picks MXU
  tilings; this replaces cblas_sgemm + the hand-written im2col).
* ``conv2d_int8_xla``  — native s8xs8->s32 XLA convolution with recentered
  activations and explicit zero-point padding, then the fused requant
  epilogue.  Replaces cblas_gemm_s8u8s32 + down_scale + transpose.
* ``conv2d_int8_gemm`` — batched im2col (static strided slices, traced once)
  feeding the shared Pallas quantized GEMM kernel, so conv and linear use the
  same MXU epilogue.

All run over the full batch in one XLA op — the reference's
``#pragma omp parallel for`` over samples (conv2d.cc:78,125) becomes MXU
batching plus (in the sharded path) batch-axis sharding on the device mesh.

Zero-point padding parity: the reference pads the im2col patch matrix with
the activation zero_point (conv2d.cc:17-31), so padded taps contribute
nothing after zero-point correction.  In the recentered s8 domain the same
pad value is ``zp_a - 128``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from .gemm_int8 import qgemm
from .quant import down_scale


def out_hw(h: int, kh: int, stride: int, padding: int) -> int:
    """Output spatial size, matching conv2d.cc's integer formula."""
    return (h - kh + 2 * padding) // stride + 1


def conv2d_fp32(x_nhwc, w_hwio, bias, stride: int, padding: int,
                preferred_dtype=jnp.float32, groups: int = 1):
    """FP32 (or bf16) convolution + bias in NHWC (grouped when groups>1)."""
    out = lax.conv_general_dilated(
        x_nhwc, w_hwio,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=preferred_dtype,
    )
    return out + bias.reshape(1, 1, 1, -1)


def s2d_input(x, kh: int, kw: int, stride: int, pad_value):
    """Space-to-depth input half: [n,h,w,c] -> [n,hp/s,wp/s,s*s*c].

    ``x`` is the (already zp-padded) conv input; works on jnp arrays under
    trace and on plain numpy arrays (host-side ingest pre-layout — the
    DataLoader applies this off the critical path so the device program
    starts directly at the stride-1 conv).
    """
    xp = jnp if not isinstance(x, np.ndarray) else np
    n, h, w, c = x.shape
    s = stride
    kp_h, kp_w = -(-kh // s), -(-kw // s)
    oh = (h - kh) // s + 1
    ow = (w - kw) // s + 1
    hp, wp = s * (oh + kp_h - 1), s * (ow + kp_w - 1)
    # slice-or-pad each spatial dim to exactly (hp, wp)
    x = x[:, :hp, :wp, :]
    if hp > x.shape[1] or wp > x.shape[2]:
        x = xp.pad(x, ((0, 0), (0, hp - x.shape[1]), (0, wp - x.shape[2]),
                       (0, 0)), constant_values=pad_value)
    xb = x.reshape(n, hp // s, s, wp // s, s, c)
    return xb.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // s, wp // s,
                                                  s * s * c)


def s2d_weights(w_hwio, stride: int):
    """Space-to-depth weight half: [kh,kw,c,o] -> [kp_h,kp_w,s*s*c,o]."""
    kh, kw, c, o = w_hwio.shape
    s = stride
    kp_h, kp_w = -(-kh // s), -(-kw // s)
    wpad = jnp.pad(w_hwio, ((0, kp_h * s - kh), (0, kp_w * s - kw),
                            (0, 0), (0, 0)))
    wb = wpad.reshape(kp_h, s, kp_w, s, c, o)
    return wb.transpose(0, 2, 1, 3, 4, 5).reshape(kp_h, kp_w, s * s * c, o)


def _space_to_depth(x, w_hwio, stride: int, pad_value: int):
    """Rewrite a stride-s VALID conv as a stride-1 conv on s*s*C channels.

    A strided conv with a small input-channel count (AlexNet conv1: C=3)
    starves the MXU's 128-deep contraction.  Folding each s x s block of
    pixels into the channel dim gives the compiler a k'=ceil(k/s) stride-1
    conv over s*s*C channels — identical arithmetic (weights are zero-padded
    into the same block layout), far better MXU tiling.

    out[p] = sum_d x[s*p+d] w[d] with d = s*b+r becomes
    out[p] = sum_b sum_r X[p+b, (r, c)] w'[b, (r, c)] where X is the
    space-to-depth input; x positions beyond the original read range only
    ever meet zero weight taps, so edge slicing/padding cannot change the
    result.
    """
    kh, kw = w_hwio.shape[0], w_hwio.shape[1]
    return (s2d_input(x, kh, kw, stride, pad_value),
            s2d_weights(w_hwio, stride))


def conv2d_int8_xla(x_u8_nhwc, qw_hwio, oc, *, stride: int, padding: int,
                    scale_a, zp_a, scale_w, scale_c, zp_c, relu=False,
                    backend: str = "xla", epilogue_dtype=None,
                    groups: int = 1, input_pre_s2d: bool = False,
                    rounding: str = "trunc"):
    """Quantized conv: recenter -> zp-pad -> (space-to-depth) -> conv.

    ``oc`` must include the +128*rowsum recentering term
    (gemm_int8.compute_offset(..., recentered=True)).  The backend is
    XLA's native integer convolution — the measured winner at every
    shape (``backend='pallas'`` raises with the study numbers).

    ``input_pre_s2d``: the input is already zp-padded + space-to-depth'ed
    u8 (host-side ingest pre-layout, s2d_input applied by the DataLoader);
    only the u8->s8 recenter and the weight-half rewrite run on device.
    """
    x = (x_u8_nhwc.astype(jnp.int32) - 128).astype(jnp.int8)
    pad_value = int(zp_a) - 128
    w = qw_hwio
    if input_pre_s2d:
        w = s2d_weights(w, stride)
        stride = 1
    else:
        if padding:
            x = jnp.pad(
                x, ((0, 0), (padding, padding), (padding, padding), (0, 0)),
                constant_values=pad_value)
        if stride > 1 and x.shape[-1] < 32 and groups == 1:
            x, w = _space_to_depth(x, w, stride, pad_value)
            stride = 1
    if backend == "pallas":
        # The Pallas direct-conv kernels were deleted (round 2) after
        # losing every measured shape to XLA's native integer conv:
        # patch-im2col 1.62 ms, accumulate-im2col 1.64, direct conv1
        # 2.96 vs XLA 0.57 fused / 0.17 bare (AlexNet b100, v5e) — the
        # losses were VMEM copy traffic; a winning kernel needs Mosaic-
        # emitter-level register windowing.  They lived in
        # ops/conv_pallas.py through commit 4848cb5.
        raise ValueError(
            "the Pallas conv kernels were removed — every measured "
            "variant lost to XLA's native integer convolution (see "
            "dispatch note); use backend='xla'")
    acc = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    acc = acc + oc.reshape(1, 1, 1, -1)
    dtype = jnp.bfloat16 if epilogue_dtype == "bfloat16" else jnp.float32
    out = down_scale(acc, scale_a, scale_w, scale_c, zp_c,
                     compute_dtype=dtype, rounding=rounding)
    if relu:
        out = jnp.maximum(out, jnp.uint8(zp_c))
    return out


def im2col_nhwc(x_nhwc, kh: int, kw: int, stride: int, padding: int,
                pad_value=0):
    """Patch extraction via kh*kw static strided slices (XLA-friendly).

    Returns [n, oh, ow, kh*kw*c] with patch element order ((l*kw + m)*c + ch)
    — the NHWC analogue of the reference's (c, kh, kw) ordering
    (conv2d.cc:5-15); the weight is reordered to match at convert time.
    """
    if padding:
        x_nhwc = jnp.pad(
            x_nhwc, ((0, 0), (padding, padding), (padding, padding), (0, 0)),
            constant_values=pad_value)
    n, h, w, c = x_nhwc.shape
    oh = (h - kh) // stride + 1
    ow = (w - kw) // stride + 1
    cols = []
    for l in range(kh):
        for m in range(kw):
            cols.append(lax.slice(
                x_nhwc,
                (0, l, m, 0),
                (n, l + stride * (oh - 1) + 1, m + stride * (ow - 1) + 1, c),
                (1, stride, stride, 1),
            ))
    patches = jnp.stack(cols, axis=3)            # [n, oh, ow, kh*kw, c]
    return patches.reshape(n, oh, ow, kh * kw * c)


def conv2d_int8_gemm(x_u8_nhwc, qw_kn, oc, *, kh: int, kw: int, stride: int,
                     padding: int, scale_a, zp_a, scale_w, scale_c, zp_c,
                     relu=False, backend: str = "auto",
                     rounding: str = "trunc"):
    """Quantized conv as im2col + the shared Pallas int8 GEMM.

    ``qw_kn`` is the weight reordered [(kh*kw*c), kc] (OIHW -> (2,3,1,0) at
    convert time).
    """
    n = x_u8_nhwc.shape[0]
    patches = im2col_nhwc(x_u8_nhwc, kh, kw, stride, padding,
                          pad_value=int(zp_a))
    _, oh, ow, k = patches.shape
    a = patches.reshape(n * oh * ow, k)
    out = qgemm(a, qw_kn, oc, backend=backend,
                scale_a=scale_a, zp_a=zp_a, scale_w=scale_w,
                scale_c=scale_c, zp_c=zp_c, relu=relu, rounding=rounding)
    return out.reshape(n, oh, ow, -1)
