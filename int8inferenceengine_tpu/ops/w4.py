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
           "w4_matmul"]


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
