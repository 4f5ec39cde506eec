"""Pallas direct int8 convolution: VMEM implicit im2col + MXU dot + epilogue.

The reference materializes an im2col patch matrix in main memory per sample
(reference: src/conv2d.cc:34-49) and calls MKL.  XLA's native s8 conv keeps
~43% of the MXU's int8 peak on AlexNet's 5x5 layer; this kernel instead
builds the patch matrix in VMEM per batch-tile (never touching HBM with the
kh*kw-fold blowup), runs ONE [M_t, kh*kw*C] x [kh*kw*C, O] MXU contraction
per tile, and applies the fused zero-point/bias/requant/ReLU epilogue from
the shared GEMM design (ops/gemm_int8.py) before writing u8 back.

Scope: stride-1 VALID convolution on pre-padded input (the layer handles
zp-padding and, for strided convs, the space-to-depth rewrite in
ops/conv.py — after which AlexNet's conv1 is also stride-1).

Mosaic layout note: collapsing (BT, OH, OW, C) -> (BT*OH*OW, C) is only a
no-op relayout when OW is a multiple of the int8 sublane tile (32), so the
output width is padded to 32 inside the kernel (input padded to match,
result sliced on return).

Grid: one step per batch-tile.  Per step VMEM: input tile [BT, H, Wp, C]
s8, patches scratch [BT*OH*OWp, kh*kw*C] s8, the full weight
[kh*kw*C, O] s8, and the s32 accumulator — BT is chosen to fit ~12 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANE = 32  # int8 sublane tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _conv_kernel(x_ref, w_ref, oc_ref, mult_ref, out_ref, patch_ref, *,
                 kh: int, kw: int, oh: int, ow_p: int, bt: int,
                 zp_c: int, relu: bool):
    """One batch-tile: VMEM im2col -> one MXU dot -> fused requant."""
    c = x_ref.shape[-1]
    m_t = bt * oh * ow_p
    for l in range(kh):
        for m in range(kw):
            sl = x_ref[:, l:l + oh, m:m + ow_p, :].reshape(m_t, c)
            patch_ref[:, (l * kw + m) * c:(l * kw + m + 1) * c] = sl
    acc = lax.dot_general(
        patch_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    cacc = acc + oc_ref[:]
    q = cacc.astype(jnp.float32) * mult_ref[:] + jnp.float32(zp_c)
    q = jnp.clip(q, 0.0, 255.0)
    qi = q.astype(jnp.int32)
    if relu:
        qi = jnp.maximum(qi, zp_c)
    u8 = pltpu.bitcast((qi - 128).astype(jnp.int8), jnp.uint8) ^ jnp.uint8(0x80)
    out_ref[:] = u8.reshape(bt, oh, ow_p, -1)


def _conv_kernel_acc(x_ref, w_ref, oc_ref, mult_ref, out_ref, *,
                     kh: int, kw: int, oh: int, ow_p: int, bt: int,
                     zp_c: int, relu: bool):
    """Variant B: no patch materialization — accumulate kh*kw direct dots.

    Trades one big [M, kh*kw*C] contraction for kh*kw [M, C] contractions,
    skipping the VMEM patch copies; wins when C is lane-sized and the copy
    bandwidth, not the MXU, limits variant A."""
    c = x_ref.shape[-1]
    m_t = bt * oh * ow_p
    acc = jnp.zeros((m_t, out_ref.shape[-1]), jnp.int32)
    for l in range(kh):
        for m in range(kw):
            sl = x_ref[:, l:l + oh, m:m + ow_p, :].reshape(m_t, c)
            acc = acc + lax.dot_general(
                sl, w_ref[l * kw + m],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    cacc = acc + oc_ref[:]
    q = cacc.astype(jnp.float32) * mult_ref[:] + jnp.float32(zp_c)
    q = jnp.clip(q, 0.0, 255.0)
    qi = q.astype(jnp.int32)
    if relu:
        qi = jnp.maximum(qi, zp_c)
    u8 = pltpu.bitcast((qi - 128).astype(jnp.int8), jnp.uint8) ^ jnp.uint8(0x80)
    out_ref[:] = u8.reshape(bt, oh, ow_p, -1)


def _pick_bt_acc(n: int, h: int, w_p: int, c: int, oh: int, ow_p: int,
                 o: int, k2c: int, budget: int = 12 * 1024 * 1024) -> int:
    best = 1
    for bt in range(1, n + 1):
        if n % bt:
            continue
        m_t = bt * oh * ow_p
        need = (bt * h * w_p * c + 2 * m_t * o * 4 + m_t * o + k2c * o)
        if need <= budget:
            best = bt
    return best


def _pick_bt(n: int, h: int, w_p: int, c: int, oh: int, ow_p: int, k2c: int,
             o: int, budget: int = 12 * 1024 * 1024) -> int:
    """Largest batch tile whose buffers fit the VMEM budget."""
    best = 1
    for bt in range(1, n + 1):
        if n % bt:
            continue
        m_t = bt * oh * ow_p
        need = (bt * h * w_p * c               # input tile s8
                + m_t * k2c                    # patches s8
                + m_t * o * 4                  # s32 accumulator (dot output)
                + m_t * o                      # u8 out
                + k2c * o)                     # weight s8
        if need <= budget:
            best = bt
    return best


def conv2d_int8_pallas(x_s8_padded, qw_hwio, oc, mult, *, zp_c: int,
                       relu: bool = False, interpret: bool = False,
                       variant: str = "patch"):
    """Stride-1 VALID s8 conv with fused requant; returns u8 NHWC.

    ``x_s8_padded``: recentered s8 input, already zp-padded.
    ``oc``: s32 per-channel offset (compute_offset(..., recentered=True)).
    ``mult``: f32 per-channel requant multiplier ``s_a*s_w/s_c``.
    """
    n, h, w, c = x_s8_padded.shape
    kh, kw, c2, o = qw_hwio.shape
    assert c == c2
    oh, ow = h - kh + 1, w - kw + 1
    k2c = kh * kw * c

    # Sublane-align the output width (see module docstring).
    ow_p = _round_up(ow, _SUBLANE)
    w_p = ow_p + kw - 1
    if w_p != w:
        x_s8_padded = jnp.pad(x_s8_padded,
                              ((0, 0), (0, 0), (0, w_p - w), (0, 0)))

    o_p = _round_up(o, 128)
    if o_p != o:
        qw_hwio = jnp.pad(qw_hwio, ((0, 0), (0, 0), (0, 0), (0, o_p - o)))
        oc = jnp.pad(oc, (0, o_p - o))
        mult = jnp.pad(mult, (0, o_p - o))
    w_kn = qw_hwio.reshape(k2c, o_p)

    if variant == "patch":
        bt = _pick_bt(n, h, w_p, c, oh, ow_p, k2c, o_p)
        m_t = bt * oh * ow_p
        kernel = functools.partial(
            _conv_kernel, kh=kh, kw=kw, oh=oh, ow_p=ow_p, bt=bt,
            zp_c=int(zp_c), relu=relu)
        w_arg = w_kn
        w_spec = pl.BlockSpec((k2c, o_p), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((m_t, k2c), jnp.int8)]
    else:  # 'acc': kh*kw accumulated dots, no patch scratch
        bt = _pick_bt_acc(n, h, w_p, c, oh, ow_p, o_p, k2c)
        kernel = functools.partial(
            _conv_kernel_acc, kh=kh, kw=kw, oh=oh, ow_p=ow_p, bt=bt,
            zp_c=int(zp_c), relu=relu)
        w_arg = w_kn.reshape(kh * kw, c, o_p)
        w_spec = pl.BlockSpec((kh * kw, c, o_p), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        scratch = []
    out = pl.pallas_call(
        kernel,
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, w_p, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, o_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, oh, ow_p, o_p), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow_p, o_p), jnp.uint8),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * oh * ow_p * o_p * k2c,
            bytes_accessed=n * h * w_p * c + k2c * o_p + n * oh * ow_p * o_p,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_s8_padded, w_arg, oc.reshape(1, o_p), mult.reshape(1, o_p))
    if (ow_p, o_p) != (ow, o):
        out = out[:, :, :ow, :o]
    return out
