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

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pack_w4", "dequant_w4", "w4_matmul_xla", "w4_matmul_pallas",
           "w4_matmul", "w4a8_matmul_xla", "w4a8_matmul_pallas",
           "w4a8_matmul"]


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


# ---------------------------------------------------------------------------
# Pallas kernel: unpack the nibbles in VMEM, next to the MXU
# ---------------------------------------------------------------------------
#
# The XLA path materializes the dequantized f32 weight in HBM every call,
# which forfeits the 8x bandwidth win W4 exists for.  This kernel streams
# the PACKED bytes into VMEM and unpacks there.  Layout choices are driven
# by the known Mosaic v5e hazards (no interleaving shape casts, no strided
# in-kernel loads): the caller pre-splits x into even/odd columns (so the
# nibble halves contract against contiguous activations), and group scales
# apply per-group via a static Python loop of small dots — no in-kernel
# repeat/reshape of the scale vector.
#
#     out[m, n] = sum_G s[n, G] * ( x_even_G @ hi_G^T + x_odd_G @ lo_G^T )
#
# DEFAULT on TPU via 'auto' since the decode-shape win (2026-08-19, v5e:
# end-to-end W4 decode 1.996 ms/step through this kernel vs 5.193 through
# XLA, which re-materializes the unpacked weights in HBM inside the scan).
# Mosaic notes: lowers after widening the nibble extraction to i32 (u8
# vector shifts fail to legalize).  On chip it is NOT bit-identical to the
# XLA path (both are f32 dots through bf16 MXU passes with different
# accumulation orders; measured op-level divergence 9e-3 against a 1e-2
# f64-oracle error for either), and slightly MORE accurate than XLA.


def _w4_kernel(xe_ref, xo_ref, pk_ref, sc_ref, b_ref, out_ref, wde, wdo,
               *, n_groups: int, half_g: int):
    # Nibble extraction happens in i32: Mosaic v5e cannot lower u8 vector
    # shifts (arith.shrui on vector<i8> fails to legalize) — widen first,
    # then shift/mask in the 32-bit domain.
    #
    # v3 structure (round 3): dequantize into VMEM SCRATCH first —
    # per-group scales apply as n_groups VPU multiplies with a [tn, 1]
    # sublane broadcast (lane-broadcasting a scalar column is
    # Mosaic-safe; it is the lane-REPEAT of a scale vector that is not)
    # — then TWO dots total.  The round-2 kernel instead applied scales
    # post-dot, costing 2 * n_groups SMALL dots per tile: at gpt2
    # decode shapes that was 12+ MXU issue latencies per call, and W4
    # decode (0.896 ms/step llama) lost to plain W8-float (0.448)
    # despite reading half the weight bytes.
    pk = pk_ref[:].astype(jnp.int32)                     # [tn, K/2]
    hi = (pk >> 4) - 8
    lo = (pk & 0x0F) - 8
    for g in range(n_groups):                            # static unroll
        c0 = g * half_g
        sc = sc_ref[:, g].reshape(-1, 1)                 # [tn, 1]
        wde[:, c0:c0 + half_g] = hi[:, c0:c0 + half_g] \
            .astype(jnp.float32) * sc
        wdo[:, c0:c0 + half_g] = lo[:, c0:c0 + half_g] \
            .astype(jnp.float32) * sc
    out_ref[:] = (
        lax.dot_general(xe_ref[:], wde[:], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
        + lax.dot_general(xo_ref[:], wdo[:], (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)
        + b_ref[:])


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def _w4_pallas_impl(xe, xo, packed, scales, bias, *, group: int,
                    interpret: bool = False):
    m, kh = xe.shape
    n = packed.shape[0]
    half_g = group // 2
    n_groups = scales.shape[1]
    tn = n if n <= 512 else next(
        (c for c in (512, 256) if n % c == 0), 256)
    kernel = functools.partial(_w4_kernel, n_groups=n_groups,
                               half_g=half_g)
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(n, tn),),
        in_specs=[
            pl.BlockSpec((m, kh), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, kh), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, kh), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, n_groups), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tn, kh), jnp.float32),   # dequantized even cols
            pltpu.VMEM((tn, kh), jnp.float32),   # dequantized odd cols
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * kh * 2,
            bytes_accessed=n * kh + m * kh * 8 + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xe, xo, packed, scales, bias.reshape(1, -1))


def w4_matmul_pallas(x, packed, scales, bias, k: int, group: int = 128,
                     interpret: bool = False):
    """Same contract as :func:`w4_matmul_xla`, packed bytes never leave
    u8 until VMEM.  Requires K % group == 0 and group even."""
    if k % group or group % 2:
        raise ValueError(f"w4_matmul_pallas needs K % group == 0 and an "
                         f"even group, got K={k} group={group}")
    xe, xo = x[:, 0::2], x[:, 1::2]
    return _w4_pallas_impl(xe, xo, packed, scales, bias, group=group,
                           interpret=interpret)


# ---------------------------------------------------------------------------
# W4A8: 4-bit grouped weights x STATIC u8 activations (round-4 VERDICT #4)
# ---------------------------------------------------------------------------
#
# The weight-only W4 path above serves float activations — every layer
# boundary dequantizes/requantizes through f32 glue, which is why W4
# decode LOST to plain W8-float despite reading half the weight bytes
# (llama 0.781 vs 0.448 ms/step, round 3).  W4A8 instead rides the
# static INT8 activation pipeline: u8 codes in, u8 codes out on the
# calibrated grid, with the 4-bit weights dequantized in VMEM against
# the recentered activations and the standard requant epilogue folded
# into the kernel:
#
#     acc[m, n] = sum_k (x[m, k] - zp_x) * (q4[n, k] * s_g[n, k//g])
#     out[m, n] = trunc/round(clip(acc * s_x / s_out
#                                  + (zp_out + bias[n] / s_out), 0, 255))
#
# The activation recentering uses the XOR-bitcast (Mosaic: no u8
# arithmetic) and is EXACT (x - zp_x is an integer in [-255, 255],
# exact in f32/bf16); weight dequantization is f32 (code * scale, <= 4
# significant bits * f32 scale — exact); only the MXU accumulation
# order differs between kernel and XLA twin, the same ±1-code
# tie-boundary caveat every float-epilogue op here documents.


def w4a8_matmul_xla(x_u8, packed, scales, zpb, k: int, group: int = 128,
                    *, zp_x: int, mult, rounding: str = "trunc"):
    """u8 [M, K] codes @ W4^T -> u8 [M, N] codes (the differential
    oracle; materializes the dequantized weight).  ``zpb`` [N] f32 =
    zp_out + bias / s_out; ``mult`` = s_x / s_out."""
    w = dequant_w4(packed, scales, k, group)
    xf = x_u8.astype(jnp.float32) - jnp.float32(zp_x)
    acc = jnp.dot(xf, w.T, preferred_element_type=jnp.float32)
    mult_v = jnp.asarray(mult, jnp.float32)
    if mult_v.ndim:                     # per-column (multi-layer calls)
        mult_v = mult_v.reshape(1, -1)
    codes = jnp.clip(acc * mult_v + zpb.reshape(1, -1), 0.0, 255.0)
    rb = jnp.float32(0.5 if rounding == "nearest" else 0.0)
    return jnp.floor(codes + rb).astype(jnp.uint8)


def _w4a8_kernel(fp_ref, xe_ref, xo_ref, pk_ref, sc_ref, zpb_ref,
                 out_ref, wde, wdo, *, n_groups: int, half_g: int):
    s8 = jnp.int8
    pk = pk_ref[:].astype(jnp.int32)                     # [tn, K/2]
    hi = (pk >> 4) - 8
    lo = (pk & 0x0F) - 8
    for g in range(n_groups):                            # static unroll
        c0 = g * half_g
        sc = sc_ref[:, g].reshape(-1, 1)                 # [tn, 1]
        wde[:, c0:c0 + half_g] = hi[:, c0:c0 + half_g] \
            .astype(jnp.float32) * sc
        wdo[:, c0:c0 + half_g] = lo[:, c0:c0 + half_g] \
            .astype(jnp.float32) * sc
    c_x = fp_ref[0]                                      # 128 - zp_x
    xe = pltpu.bitcast(xe_ref[:] ^ jnp.uint8(0x80), s8) \
        .astype(jnp.float32) + c_x                       # x_even - zp_x
    xo = pltpu.bitcast(xo_ref[:] ^ jnp.uint8(0x80), s8) \
        .astype(jnp.float32) + c_x
    acc = (
        lax.dot_general(xe, wde[:], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
        + lax.dot_general(xo, wdo[:], (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32))
    codes = jnp.clip(acc * fp_ref[1] + zpb_ref[:], 0.0, 255.0)
    codes = jnp.floor(codes + fp_ref[2]).astype(jnp.int32)
    out_ref[:] = pltpu.bitcast((codes - 128).astype(s8), jnp.uint8) \
        ^ jnp.uint8(0x80)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def _w4a8_pallas_impl(fparams, xe, xo, packed, scales, zpb, *,
                      group: int, interpret: bool = False):
    m, kh = xe.shape
    n = packed.shape[0]
    half_g = group // 2
    n_groups = scales.shape[1]
    tn = n if n <= 512 else next(
        (c for c in (512, 256) if n % c == 0), 256)
    kernel = functools.partial(_w4a8_kernel, n_groups=n_groups,
                               half_g=half_g)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(n, tn),),
        in_specs=[
            smem,
            pl.BlockSpec((m, kh), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, kh), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, kh), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, n_groups), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((tn, kh), jnp.float32),   # dequantized even cols
            pltpu.VMEM((tn, kh), jnp.float32),   # dequantized odd cols
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * kh * 2,
            bytes_accessed=n * kh + m * kh * 2 + m * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(fparams, xe, xo, packed, scales, zpb.reshape(1, -1))


# --- v2: packed bytes FEED THE MXU (no dequantized weight ever exists) --
#
# v1 above re-materializes the dequantized weight in VMEM scratch every
# call; that unpack chain (u8 widen -> shift -> mask -> sub -> f32
# convert -> scale -> write, per weight element) runs at ~100 G weights/s
# on the VPU — 8x SLOWER than just reading s8 from HBM, which is why
# W4A8 v1 lost to W8 modes (llama 0.637 ms/step vs static 0.155;
# standalone 6.4-96 us/call vs 0.36-15 packed-read bounds, 2026-08-20).
#
# v2 removes the unpack from the element path entirely.  With
# P = 16*hi' + lo' (the packed byte; hi'/lo' are the +8-shifted 4-bit
# codes) and L = P & 15:
#
#     x_e . hi'  =  (x_e . P  -  x_e . L) / 16        (exact integers)
#     x_o . lo'  =   x_o . L
#
# so THREE MXU dots against operands that need at most one cheap u8
# bitwise op (L = P & 15; P itself recenters via the XOR bitcast) give
# the exact integer accumulator.  Per-GROUP partials come from a
# block-diagonal activation operand (row (g, m) holds x'[m] only in
# group g's columns — the decode-attention aq_wide trick): one dot
# yields every group's partial in the M axis, and the per-group scales
# apply to the [M, N] partial accumulators (tiny) instead of the [N, K]
# weights (huge).  Everything is exact: operands are integers <= 255 in
# bf16 (8 mantissa bits hold 256), each dot's partial sums stay under
# 2^24 (<= 255 * 255 * group), and /16 is an exact f32 multiply.
#
# Cost model: HBM packed read (the point of W4) + 3 block-diagonal dots
# (FLOPs ~ 3 * 2 * M*G * K/2 * N — G x the dense dot, still trivial at
# decode M) + O(M*N*G) VPU epilogue.  Measured on chip (2026-08-20):
# 768x768 6.4 -> 1.9 us/call, head 32000x768 95.8 -> 17.3 (packed-read
# bound 15.0); llama W4A8 step 0.637 -> 0.244 ms.


def _w4a8_kernel_v2(fp_ref, xe_ref, xo_ref, pk_ref, sct_ref, mult_ref,
                    zpb_ref, out_ref, xbd_scr, rs_scr, *, n_groups: int,
                    half_g: int, m: int, wt: bool):
    """All-s8-operand revision: the activations enter as x - 128 (the
    XOR bitcast — fits s8 exactly), so every dot runs the INT8 MXU path
    with i32 accumulation and NO operand conversions; the zero-point
    residue (128 - zp_x) * sum_k W_deq[n, k] is a per-column constant
    the WRAPPER folds into ``zpb`` (it never appears here).  Integer
    algebra per group (codes are the +8-shifted nibbles hi'/lo' of
    P = 16*hi' + lo', L = P & 15):

        Xm.P^T = D1 + 128 * rs_m        (D1 = Xm.(P - 128)^T)
        Xm_e.hi'^T = (Xm_e.P^T - Xm_e.L^T) >> 4     (exact: mult of 16)
        I_raw = Xm_e.hi'^T + Xm_o.lo'^T - 8 * rs_m  (undo the +8 shift)

    all EXACT in bf16-operand / f32-accumulate MXU dots (operand values
    are integers <= 255 — inside bf16's 8 mantissa bits; partial sums
    <= 128 * 128 * half_g < 2^21 < 2^24).  bf16 operands, NOT s8: the
    s8-operand i32-accumulate form was measured 4.6x SLOWER at the
    vocab head (173 vs 38 us/call, 2026-08-20, either operand
    orientation) — the int8 MXU path wants (32, 128)-tiled operands and
    MG = 48-row activations lower badly.  The f32 work is G tiny
    scale-muls on the [M, tn] partials + the requant."""
    f32, i32, s8, bf16 = jnp.float32, jnp.int32, jnp.int8, jnp.bfloat16
    g, mg = n_groups, n_groups * m
    kh = g * half_g

    # grid-invariant block-diagonal activations: build once into scratch
    # (row (grp, mi) = grp * m + mi holds x[mi] - 128 only in group
    # grp's half_g columns; 0 elsewhere contributes nothing).
    @pl.when(pl.program_id(0) == 0)
    def _build():
        rowg = lax.broadcasted_iota(i32, (mg, kh), 0) // m
        colg = lax.broadcasted_iota(i32, (mg, kh), 1) // half_g
        mask = rowg == colg
        xe = pltpu.bitcast(xe_ref[:] ^ jnp.uint8(0x80), s8).astype(f32)
        xo = pltpu.bitcast(xo_ref[:] ^ jnp.uint8(0x80), s8).astype(f32)
        xe_bd = jnp.where(mask, jnp.concatenate([xe] * g, axis=0), 0.0)
        xo_bd = jnp.where(mask, jnp.concatenate([xo] * g, axis=0), 0.0)
        rs_e = jnp.sum(xe_bd, axis=1, keepdims=True)
        rs = rs_e + jnp.sum(xo_bd, axis=1, keepdims=True)
        xbd_scr[0] = xe_bd.astype(bf16)
        xbd_scr[1] = xo_bd.astype(bf16)
        rs_scr[0] = jnp.broadcast_to(rs_e, (mg, 128))
        rs_scr[1] = jnp.broadcast_to(rs, (mg, 128))

    xe_bd, xo_bd = xbd_scr[0], xbd_scr[1]
    rs_e = rs_scr[0][:, 0:1]                             # [MG, 1] f32
    rs_m = rs_scr[1][:, 0:1]

    # dot orientation is SHAPE-dependent (both measured on chip,
    # 2026-08-20): single-tile calls (N <= 1024, the transformer block
    # Linears) run the [kh, N] transposed weight ~20% faster (4.6 vs
    # 5.1 us at 768x768), but multi-tile calls (the vocab head) run the
    # [tn, kh] row-major weight with a transposed-B dot 5x faster (37.8
    # vs 185 us at N=32000) — the natural-rhs form relayouts each tile.
    # ``wt``: weight arrives transposed [1, kh, tn]; else [tn, kh].
    if wt:
        pk = pk_ref[0]                                   # [kh, tn] u8
    else:
        pk = pk_ref[:]                                   # [tn, kh] u8
    ps8 = pltpu.bitcast(pk ^ jnp.uint8(0x80), s8).astype(bf16)  # P - 128
    lo = pltpu.bitcast(pk & jnp.uint8(0x0F), s8).astype(bf16)   # L <= 15

    if wt:
        def dot_w(x, y):                                 # y [kh, tn]
            return lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)
    else:
        def dot_w(x, y):                                 # y [tn, kh]
            return lax.dot_general(x, y, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    d1 = dot_w(xe_bd, ps8)                               # Xe.P -128*rs_e
    d2 = dot_w(xe_bd, lo)                                # Xe.L
    d3 = dot_w(xo_bd, lo)                                # Xo.L
    ints = ((d1 + 128.0 * rs_e - d2) * f32(0.0625)
            + d3 - 8.0 * rs_m)                           # [MG, tn] exact

    acc = ints[0:m, :] * sct_ref[0].reshape(1, -1)
    for gi in range(1, g):                               # static unroll
        acc = acc + ints[gi * m:(gi + 1) * m, :] \
            * sct_ref[gi].reshape(1, -1)
    # mult is a PER-COLUMN vector so N-concatenated multi-layer calls
    # (w4a8_matmul_multi) stay bit-identical to the standalone calls:
    # each column sees exactly the arithmetic its own layer would run
    codes = jnp.clip(acc * mult_ref[:] + zpb_ref[:], 0.0, 255.0)
    codes = jnp.floor(codes + fp_ref[2]).astype(i32)
    out_ref[:] = pltpu.bitcast((codes - 128).astype(s8), jnp.uint8) \
        ^ jnp.uint8(0x80)


def _w4a8_tile_n(n: int) -> int:
    """Largest 128-multiple tile dividing the (padded) N — the tile
    count is the per-call overhead multiplier; the llama head's
    N=32000 wants 1280-wide tiles, not 256."""
    if n <= 1024:
        return n
    return next((c for c in (1280, 1024, 896, 768, 640, 512, 384, 256,
                             128) if n % c == 0), 128)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def _w4a8_pallas_impl_v2(fparams, xe, xo, pk_op, scales_t, mult_v,
                         zpb, *, group: int, interpret: bool = False):
    m, kh = xe.shape
    wt = pk_op.ndim == 3                       # [1, kh, n] or [n, kh]
    n = pk_op.shape[2] if wt else pk_op.shape[0]
    tn = _w4a8_tile_n(n)
    nt = n // tn
    half_g = group // 2
    n_groups = scales_t.shape[0]
    kernel = functools.partial(_w4a8_kernel_v2, n_groups=n_groups,
                               half_g=half_g, m=m, wt=wt)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    w_spec = (pl.BlockSpec((1, kh, tn), lambda j: (0, 0, j),
                           memory_space=pltpu.VMEM) if wt else
              pl.BlockSpec((tn, kh), lambda j: (j, 0),
                           memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            smem,
            pl.BlockSpec((m, kh), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, kh), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((n_groups, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2, m * n_groups, kh), jnp.bfloat16),  # Xe/Xo bd
            pltpu.VMEM((2, m * n_groups, 128), jnp.float32),  # rowsums
        ],
        compiler_params=pltpu.CompilerParams(
            # "arbitrary": the tile-0 scratch build must run first
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * m * n_groups * n * kh,
            bytes_accessed=n * kh + m * kh * 2 + m * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(fparams, xe, xo, pk_op, scales_t, mult_v.reshape(1, -1),
      zpb.reshape(1, -1))


# kernel revision switch (A/B tools flip it; v2 is the measured winner)
_W4A8_V2 = True


def w4a8_matmul_pallas(x_u8, packed, scales, zpb, k: int,
                       group: int = 128, *, zp_x: int, mult,
                       rounding: str = "trunc", wsum=None,
                       interpret: bool = False):
    """Same contract as :func:`w4a8_matmul_xla`; packed bytes and u8
    activations stay 8-bit until VMEM.  ``wsum`` (optional, [N] f32 =
    row sums of the dequantized weight) feeds the v2 kernel's
    zero-point fold — computed here (and hoisted out of any enclosing
    scan as loop-invariant) when not provided; layers pass their
    convert-time value."""
    if k % group or group % 2:
        raise ValueError(f"w4a8_matmul_pallas needs K % group == 0 and "
                         f"an even group, got K={k} group={group}")
    xe, xo = x_u8[:, 0::2], x_u8[:, 1::2]
    rb = 0.5 if rounding == "nearest" else 0.0
    mult_s = (jnp.float32(0)                 # vector mult rides its own
              if getattr(mult, "ndim", 0)    # operand; slot unused (v2)
              else jnp.float32(mult))
    fparams = jnp.stack([jnp.float32(128 - int(zp_x)), mult_s,
                         jnp.float32(rb), jnp.float32(0)])
    m, n_groups = x_u8.shape[0], scales.shape[1]
    if getattr(mult, "ndim", 0) and not (
            _W4A8_V2 and m % 8 == 0 and m * n_groups <= 1024):
        # vector mult (multi-layer) only exists on the v2 kernel; the
        # v1 fallback takes a scalar — compose through the twin instead
        return w4a8_matmul_xla(x_u8, packed, scales, zpb, k, group,
                               zp_x=zp_x, mult=mult, rounding=rounding)
    if _W4A8_V2 and m % 8 == 0 and m * n_groups <= 1024:
        # the kernel contracts x - 128 (s8-exact); the residue
        # (128 - zp_x) * sum_k W_deq[n, k] folds into the requant offset.
        # NOTE: omitting ``wsum`` computes it from the packed weight
        # HERE — inside a scan that dequantizes the whole weight EVERY
        # step (measured: +145 us/call at the llama head until the
        # layer started passing its convert-time value).  Pass it.
        if wsum is None:
            wsum = jnp.sum(dequant_w4(packed, scales, k, group), axis=1)
        n = packed.shape[0]
        mult_v = jnp.broadcast_to(
            jnp.asarray(mult, jnp.float32).reshape(-1), (n,))
        zpb_eff = zpb + mult_v * jnp.float32(128 - int(zp_x)) * wsum
        # pad N to a 128 multiple (slice after); single-tile calls pass
        # the weight transposed [1, kh, n] (one-time, scan-hoisted),
        # multi-tile calls pass it row-major — see the kernel comment
        n_pad = -(-n // 128) * 128
        pk = jnp.pad(packed, ((0, n_pad - n), (0, 0)))
        if n_pad <= 1024:
            pk_op = jnp.transpose(pk)[None]
        else:
            pk_op = pk
        sct = jnp.pad(jnp.transpose(scales), ((0, 0), (0, n_pad - n)))
        mult_p = jnp.pad(mult_v, (0, n_pad - n))
        zpb_p = jnp.pad(zpb_eff, (0, n_pad - n))
        out = _w4a8_pallas_impl_v2(fparams, xe, xo, pk_op, sct, mult_p,
                                   zpb_p, group=group,
                                   interpret=interpret)
        return out[:, :n] if n_pad != n else out
    return _w4a8_pallas_impl(fparams, xe, xo, packed, scales, zpb,
                             group=group, interpret=interpret)


def w4a8_matmul(x_u8, packed, scales, zpb, k: int, group: int = 128,
                backend: str = "auto", **kw):
    """Dispatch: the Pallas kernel on TPU for kernel-shaped calls (same
    envelope as w4_matmul), the XLA twin elsewhere."""
    fits = k % group == 0 and group % 2 == 0 and x_u8.shape[0] <= 512
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" and fits \
            else "xla"
    if backend == "pallas" and fits:
        return w4a8_matmul_pallas(x_u8, packed, scales, zpb, k, group,
                                  **kw)
    kw.pop("interpret", None)
    kw.pop("wsum", None)
    return w4a8_matmul_xla(x_u8, packed, scales, zpb, k, group, **kw)


def w4a8_matmul_multi(x_u8, parts, k: int, group: int = 128, *,
                      zp_x: int, rounding: str = "trunc",
                      backend: str = "auto"):
    """Several W4A8 Linears sharing the input ``x`` as ONE kernel call
    (the W4A8 analogue of qgemm_multi): concatenates the packed
    weights / scales / requant vectors along N.  Bit-identical to the
    per-layer calls — the kernel's requant is per-column, so each
    column runs exactly its own layer's arithmetic.

    ``parts``: list of dicts with packed, scales, zpb, mult, wsum.
    Returns the per-part outputs (split back along N).
    """
    ns = [p["packed"].shape[0] for p in parts]
    packed = jnp.concatenate([p["packed"] for p in parts], axis=0)
    scales = jnp.concatenate([p["scales"] for p in parts], axis=0)
    zpb = jnp.concatenate([jnp.asarray(p["zpb"], jnp.float32).reshape(-1)
                           for p in parts])
    mult = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(p["mult"], jnp.float32).reshape(-1),
                         (n,)) for p, n in zip(parts, ns)])
    wsum = jnp.concatenate([jnp.asarray(p["wsum"], jnp.float32)
                            for p in parts])
    out = w4a8_matmul(x_u8, packed, scales, zpb, k, group,
                      backend=backend, zp_x=zp_x, mult=mult,
                      rounding=rounding, wsum=wsum)
    outs, off = [], 0
    for n in ns:
        outs.append(out[:, off:off + n])
        off += n
    return outs


def w4_matmul(x, packed, scales, bias, k: int, group: int = 128,
              backend: str = "auto"):
    """Dispatch.  'auto' -> the Pallas kernel on TPU (packed bytes stay
    u8 until VMEM), XLA elsewhere / for shapes the kernel doesn't take
    (K % group != 0, odd group, or M > 512 — the kernel holds the whole
    unpacked [M, N] f32 block in VMEM and OOMs past ~1k rows).

    Measured (2026-08-19, one v5e, gpt2-small-ish b8 decode): the
    end-to-end W4 decode step runs 1.996 ms/step through the kernel vs
    5.193 ms/step through the XLA path — XLA re-materializes the
    unpacked weights through HBM inside the scan.  (Op-level microbench
    deltas for XLA are meaningless here: with a loop-invariant weight
    XLA hoists the unpack out of the timing scan, producing ~0 or even
    negative deltas.)"""
    fits = k % group == 0 and group % 2 == 0 and x.shape[0] <= 512
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" and fits \
            else "xla"
    if backend == "pallas" and fits:
        return w4_matmul_pallas(x, packed, scales, bias, k, group)
    return w4_matmul_xla(x, packed, scales, bias, k, group)
