"""Fused INT8 attention: QK^T -> requant -> softmax -> requant -> P@V in VMEM.

The composed transformer path (models/vit.py, models/text_transformer.py)
runs attention as three calibrated layers — ``QuantMatmul`` (scores),
``QuantSoftmax``, ``QuantMatmul`` (context) — which is semantically right
but materializes the [B, H, T, T] score and probability tensors in HBM
twice each.  The reference engine has no attention at all (its zoo is
CNN-only, SURVEY.md §2.3); this is the TPU-native design for the op:
one Pallas kernel per (batch, head) that keeps the whole score matrix in
VMEM, with the exact same quantized semantics as the composed layers:

    codes_s = trunc(clip(exact_int_qk * s_q*s_k*alpha/s_s + zp_s))
    p       = softmax((codes_s - zp_s) * s_s)           # 8-bit bottleneck
    codes_p = trunc(clip(p / s_p + zp_p))               # kept: calibration
    out     = trunc(clip(exact_int_pv * s_p*s_v/s_c + zp_c))

i.e. the fused kernel REPLAYS the composed path's intermediate
quantization (scores and probabilities still pass through their
calibrated u8 grids) so calibration transfers unchanged; it just never
writes the codes to HBM.

Zero-point math (both stages are activation x activation, see
ops/qmatmul.py): operands are recentered u8 -> s8 via the XOR bitcast,
and the data-dependent row/column-sum corrections are computed ON THE MXU
as two extra dots against a ones matrix — Mosaic-friendly (no s8->s32
vector casts, no 1D->2D reshapes) and exact:

    sum_k (a-zp_a)(b-zp_b) = a'.b' + (128-zp_b) * (a'.ones)
                                   + (128-zp_a) * (ones.b') + K c_a c_b

All corrections and epilogues run in f32; every intermediate integer here
is < 2^24 (|acc| <= T*128*128 ~ 3.2M for T <= 1024) so f32 arithmetic is
exact and bit-identical to the composed int32 path.

Padding contract: T and D are padded to the kernel grid with code 128,
which recenters to 0 and therefore contributes nothing to dots or sums;
the static ``K * c_a * c_b`` terms use the REAL dims.  Padded score
columns are masked to -inf before softmax and their probability codes
forced to 128 (-> p' = 0) so padded positions never leak into real ones.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import quant as quant_ops
from .qmatmul import qmatmul_act


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA-composed path (the oracle — literally the three composed layers' math)
# ---------------------------------------------------------------------------

def attention_xla(q_u8, k_u8, v_u8, *, scale_q, zp_q, scale_k, zp_k,
                  scale_v, zp_v, scale_s, zp_s, scale_p, zp_p,
                  scale_c, zp_c, alpha: float, rounding: str = "trunc"):
    """Composed attention: bit-identical to QuantMatmul+QuantSoftmax+
    QuantMatmul run back to back (the differential oracle for the kernel).
    """
    s = qmatmul_act(q_u8, k_u8, scale_a=scale_q, zp_a=zp_q,
                    scale_b=scale_k, zp_b=zp_k, scale_c=scale_s, zp_c=zp_s,
                    alpha=alpha, transpose_b=True, rounding=rounding)
    f = quant_ops.dequantize_u8(s, scale_s, zp_s)
    p = quant_ops.quantize_u8(jax.nn.softmax(f, axis=-1), scale_p, zp_p,
                              rounding)
    return qmatmul_act(p, v_u8, scale_a=scale_p, zp_a=zp_p,
                       scale_b=scale_v, zp_b=zp_v, scale_c=scale_c,
                       zp_c=zp_c, rounding=rounding)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

# fparams layout (f32 SMEM vector)
_MULT_S, _ZP_S, _S_S, _S_P, _ZP_P, _MULT_O, _ZP_C, _RB, \
    _C_Q, _C_K, _C_P, _C_V = range(12)


def _attn_kernel(fp_ref, q_ref, k_ref, v_ref, o_ref, *, t_real: int,
                 d_real: int):
    """One (batch*head) slice: q/k/v [1, Tp, Dp] u8 -> out [1, Tp, Dp] u8."""
    f32, s8 = jnp.float32, jnp.int8
    a = pltpu.bitcast(q_ref[0] ^ jnp.uint8(0x80), s8)        # [Tp, Dp]
    b = pltpu.bitcast(k_ref[0] ^ jnp.uint8(0x80), s8)
    tp, dp = a.shape
    ones_d = jnp.ones((tp, dp), s8)

    def dot_t(x, y):                                  # x [M,K] . y[N,K]^T
        return lax.dot_general(x, y, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)

    c_q, c_k = fp_ref[_C_Q], fp_ref[_C_K]
    acc = (dot_t(a, b).astype(f32)
           + c_k * dot_t(a, ones_d).astype(f32)       # (128-zp_k) * rowsum_q'
           + c_q * dot_t(ones_d, b).astype(f32)       # (128-zp_q) * colsum_k'
           + f32(d_real) * c_q * c_k)
    codes = jnp.clip(acc * fp_ref[_MULT_S] + fp_ref[_ZP_S], 0.0, 255.0)
    codes = jnp.floor(codes + fp_ref[_RB])            # trunc (non-negative)

    x = (codes - fp_ref[_ZP_S]) * fp_ref[_S_S]        # dequant at smax input
    if t_real != tp:             # padded path (unused since the kernel
        col = lax.broadcasted_iota(jnp.int32, (tp, tp), 1)   # went pad-free;
        x = jnp.where(col < t_real, x, -jnp.inf)             # kept for the
    m = jnp.max(x, axis=1, keepdims=True)                    # generic API)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)

    pcodes = jnp.clip(p / fp_ref[_S_P] + fp_ref[_ZP_P], 0.0, 255.0)
    pcodes = jnp.floor(pcodes + fp_ref[_RB])
    if t_real != tp:
        pcodes = jnp.where(col < t_real, pcodes, f32(128.0))  # -> p' = 0
    p8 = (pcodes.astype(jnp.int32) - 128).astype(s8)       # [Tp, Tp]

    v8 = pltpu.bitcast(v_ref[0] ^ jnp.uint8(0x80), s8)     # [Tp, Dp]
    ones_t = jnp.ones((tp, tp), s8)

    def dot_n(x, y):                                  # x [M,K] . y [K,N]
        return lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    c_p, c_v = fp_ref[_C_P], fp_ref[_C_V]
    acc2 = (dot_n(p8, v8).astype(f32)
            + c_v * dot_n(p8, ones_d).astype(f32)     # (128-zp_v) * rowsum_p'
            + c_p * dot_n(ones_t, v8).astype(f32)     # (128-zp_p) * colsum_v'
            + f32(t_real) * c_p * c_v)
    qo = jnp.clip(acc2 * fp_ref[_MULT_O] + fp_ref[_ZP_C], 0.0, 255.0)
    qo = (qo + fp_ref[_RB]).astype(jnp.int32)
    o_ref[0] = pltpu.bitcast((qo - 128).astype(s8), jnp.uint8) \
        ^ jnp.uint8(0x80)


@functools.partial(jax.jit,
                   static_argnames=("t_real", "d_real", "interpret"))
def _attn_pallas_impl(q3, k3, v3, fparams, *, t_real: int, d_real: int,
                      interpret: bool = False):
    g, tp, dp = q3.shape
    kernel = functools.partial(_attn_kernel, t_real=t_real, d_real=d_real)
    spec = pl.BlockSpec((1, tp, dp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec,
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((g, tp, dp), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * tp * tp * dp * 2,
            bytes_accessed=4 * g * tp * dp,
            transcendentals=g * tp * tp,
        ),
        interpret=interpret,
    )(fparams, q3, k3, v3)


def attention_pallas(q_u8, k_u8, v_u8, *, scale_q, zp_q, scale_k, zp_k,
                     scale_v, zp_v, scale_s, zp_s, scale_p, zp_p,
                     scale_c, zp_c, alpha: float, rounding: str = "trunc",
                     interpret: bool = False):
    """Fused kernel entry: u8 [..., T, D] x3 -> u8 [..., T, D].

    Scales/zero-points are runtime scalars (SMEM) so ONE compiled kernel
    serves every attention layer of a given shape — TPU compiles through
    the tunnel cost minutes each; 12 per-layer specializations would be
    unusable.
    """
    *lead, t, d = q_u8.shape
    g = 1
    for n in lead:
        g *= n
    # Pad-free: Mosaic masks unaligned dims inside the kernel (dots,
    # reductions and elementwise ops all handle T=197/D=64 natively), so
    # each grid step reads exactly one real [t, d] slice.  An earlier
    # version padded T/D up to 128 multiples with code 128 — 2.6x extra
    # HBM traffic on every operand and 1.7x wasted VPU work; measured
    # 0.153 ms/op padded vs the pad-free kernel on ViT shapes.
    q3 = q_u8.reshape(g, t, d)
    k3 = k_u8.reshape(g, t, d)
    v3 = v_u8.reshape(g, t, d)
    # Same f32 op order as the composed path (qmatmul_act / quantize_u8)
    # so both backends share every rounding.
    mult_s = (jnp.float32(scale_q) * jnp.float32(scale_k)
              * jnp.float32(alpha) / jnp.float32(scale_s))
    mult_o = (jnp.float32(scale_p) * jnp.float32(scale_v)
              / jnp.float32(scale_c))
    rb = 0.5 if rounding == "nearest" else 0.0
    fparams = jnp.stack([
        mult_s, jnp.float32(zp_s), jnp.float32(scale_s),
        jnp.float32(scale_p), jnp.float32(zp_p), mult_o,
        jnp.float32(zp_c), jnp.float32(rb),
        jnp.float32(128 - int(zp_q)), jnp.float32(128 - int(zp_k)),
        jnp.float32(128 - int(zp_p)), jnp.float32(128 - int(zp_v)),
    ])
    out = _attn_pallas_impl(q3, k3, v3, fparams, t_real=t, d_real=d,
                            interpret=interpret)
    return out.reshape(*lead, t, d)


def attention(q_u8, k_u8, v_u8, *, backend: str = "auto", **kw):
    """Dispatch.  'auto' -> the composed XLA path, by measurement:

    on one v5e chip the composed path beat the Pallas kernel at every
    shape tried — ViT-Tiny (B128, H3, T197, D64): 0.063 vs 0.153 ms/op
    (model-level: 7,972 vs 7,098 img/s); GPT-ish (B8, H12, T512, D64):
    0.074 vs 0.502 ms/op.  XLA fuses dequant+softmax+requant into ONE
    VPU pass over the u8 score codes and batches all (batch, head)
    slices at full occupancy, while the kernel's per-slice grid
    serializes that VPU work — the score tensors are u8, so the HBM
    round-trips the fusion leaves behind are small.  Same verdict as the
    conv study (ops/conv_pallas.py): beating XLA's fusion machinery on
    bandwidth-bound chains needs a Mosaic-emitter-level kernel, not a
    Pallas grid.  The kernel stays selectable
    (``QuantConfig.fused_attention='pallas'``) and bit-compatible."""
    if backend == "auto":
        backend = "xla"
    if backend == "pallas":
        return attention_pallas(q_u8, k_u8, v_u8, **kw)
    return attention_xla(q_u8, k_u8, v_u8, **kw)


# ---------------------------------------------------------------------------
# Cached-decode attention (M = 1 over a static KV cache)
# ---------------------------------------------------------------------------
#
# The decode step's attention is q [B, H, 1, D] against the full cache
# k/v [B, H, T_max, D] with only the first ``valid`` positions live.  Run
# through the composed layers (QuantMatmul -> QuantSoftmax(valid_len) ->
# QuantMatmul) inside the generate() scan, XLA lowers the M=1 batched s8
# dot as a kLoop multiply+reduce fusion over the i32-widened cache, with
# the cache laid out for the dynamic-update-slice WRITE (T majormost)
# rather than the read — measured 240us per layer per step on a v5e
# (est. 105k cycles in the HLO backend_config) against a ~4us HBM bound;
# 12 layers of that were 70% of the gpt2-small decode step.  The same op
# compiled standalone runs in 7us — it is the in-loop layout choice, not
# the math, that kills it.
#
# The Pallas kernel takes the layout back: grid over B, each step holding
# one batch row's [H, T, D] cache slices in VMEM (canonical (T, D)
# tiling), with a static loop over heads doing s8 MXU dots.  ALL integer
# arithmetic is i32 (dots exact on the MXU, corrections as i32 scalar
# multiplies), so the accumulators are bit-identical to qmatmul_act's;
# the f32 segments (requant epilogues, softmax) replay the composed op
# order exactly (same mult construction, division by s_p, trunc-vs-
# nearest ordering).  Masked positions quantize to exactly zp_p and
# contribute exactly zero through the P@V zero-point correction — the
# u8-KV-cache invariant the composed path documents.
#
# ``valid`` is an SMEM i32 vector [B]: generate() broadcasts its scalar
# position, the serving engine passes per-slot positions.

# iparams layout (i32 SMEM vector): the integer zero-point offsets
_I_CQ, _I_CK, _I_CP, _I_CV = range(4)


def _decode_attn_kernel(valid_ref, fp_ref, ip_ref, q_ref, k_ref, v_ref,
                        o_ref, *, n_heads: int, t: int, d: int):
    f32, i32, s8 = jnp.float32, jnp.int32, jnp.int8
    b = pl.program_id(0)
    valid = valid_ref[b]
    rb = fp_ref[_RB]
    c_q, c_k = ip_ref[_I_CQ], ip_ref[_I_CK]
    c_p, c_v = ip_ref[_I_CP], ip_ref[_I_CV]

    a8 = pltpu.bitcast(q_ref[0] ^ jnp.uint8(0x80), s8)       # [H, D]
    ones_1d = jnp.ones((1, d), f32)
    ones_1t = jnp.ones((1, t), f32)
    colio = lax.broadcasted_iota(i32, (1, t), 1)

    # Mosaic's in-kernel dot can't accumulate M=1 products in i32
    # (NotImplementedError: preferred_element_type=int32), so the dots run
    # in f32 and cast back — EXACT here: s8-valued operands are integers
    # <= 128 (exactly representable even after a bf16 MXU pass-split) and
    # every accumulator stays below 2^24 (|prod| <= 2^14, <= 1024 terms —
    # the dispatch in decode_attention() enforces T <= 1024),
    # so the i32 cast recovers the composed path's integer accumulator
    # bit-for-bit.
    def dot_t(x, y):                                 # x [M,K] . y [N,K]^T
        return lax.dot_general(x, y, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32).astype(i32)

    def dot_n(x, y):                                 # x [M,K] . y [K,N]
        return lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32).astype(i32)

    af = a8.astype(f32)                              # [H, D] exact ints
    ones_td = jnp.ones((t, d), f32)
    rows = []
    for hh in range(n_heads):                        # static unroll
        a_row = af[hh:hh + 1, :]                     # [1, D]
        kf = pltpu.bitcast(k_ref[0, hh] ^ jnp.uint8(0x80), s8) \
            .astype(f32)                             # [T, D]
        # exact i32 accumulator == qmatmul_act's (recenter + corrections)
        acc = (dot_t(a_row, kf)
               + c_k * dot_t(a_row, ones_1d)         # (128-zp_k)*rowsum_q'
               + c_q * dot_t(ones_1d, kf)            # (128-zp_q)*colsum_k'
               + i32(d) * c_q * c_k)                 # [1, T]
        codes = jnp.clip(acc.astype(f32) * fp_ref[_MULT_S] + fp_ref[_ZP_S],
                         0.0, 255.0)
        codes = jnp.floor(codes + rb)
        x = (codes - fp_ref[_ZP_S]) * fp_ref[_S_S]
        x = jnp.where(colio < valid, x, -jnp.inf)
        m = jnp.max(x, axis=1, keepdims=True)
        e = jnp.exp(x - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        pcodes = jnp.clip(p / fp_ref[_S_P] + fp_ref[_ZP_P], 0.0, 255.0)
        pcodes = jnp.floor(pcodes + rb)
        p8 = pcodes - 128.0                          # [1, T] exact ints
        vf = pltpu.bitcast(v_ref[0, hh] ^ jnp.uint8(0x80), s8) \
            .astype(f32)                             # [T, D]
        acc2 = (dot_n(p8, vf)
                + c_v * dot_n(p8, ones_td)           # rowsum_p' per col
                + c_p * dot_n(ones_1t, vf)           # colsum_v'
                + i32(t) * c_p * c_v)                # [1, D]
        qo = jnp.clip(acc2.astype(f32) * fp_ref[_MULT_O] + fp_ref[_ZP_C],
                      0.0, 255.0)
        qo = (qo + rb).astype(i32)
        rows.append(pltpu.bitcast((qo - 128).astype(s8), jnp.uint8)
                    ^ jnp.uint8(0x80))
    o_ref[0] = jnp.concatenate(rows, axis=0)         # [H, D]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_attn_pallas_impl(q3, k4, v4, valid, fparams, iparams, *,
                             interpret: bool = False):
    bsz, n_heads, t, d = k4.shape
    kernel = functools.partial(_decode_attn_kernel, n_heads=n_heads,
                               t=t, d=d)
    kv_spec = pl.BlockSpec((1, n_heads, t, d), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, n_heads, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # valid [B]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # fparams
            pl.BlockSpec(memory_space=pltpu.SMEM),   # iparams
            q_spec, kv_spec, kv_spec,
        ],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n_heads, d), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n_heads * t * d * 2,
            # k + v caches each B*H*T*D bytes, plus the q row and output.
            bytes_accessed=2 * bsz * n_heads * t * d + 2 * bsz * n_heads * d,
            transcendentals=bsz * n_heads * t,
        ),
        interpret=interpret,
    )(valid, fparams, iparams, q3, k4, v4)


def decode_attention_xla(q_u8, k_u8, v_u8, valid, *, scale_q, zp_q,
                         scale_k, zp_k, scale_v, zp_v, scale_s, zp_s,
                         scale_p, zp_p, scale_c, zp_c, alpha: float,
                         rounding: str = "trunc"):
    """Composed decode attention (the oracle): literally QuantMatmul ->
    QuantSoftmax(valid_len) -> QuantMatmul on [B, H, 1, T] scores.

    ``valid`` broadcasts against the score columns: a scalar (generate's
    single position) or [B, 1, 1, 1] (per-slot serving positions).
    """
    s = qmatmul_act(q_u8, k_u8, scale_a=scale_q, zp_a=zp_q,
                    scale_b=scale_k, zp_b=zp_k, scale_c=scale_s, zp_c=zp_s,
                    alpha=alpha, transpose_b=True, rounding=rounding)
    f = quant_ops.dequantize_u8(s, scale_s, zp_s)
    tq, tk = f.shape[-2], f.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    f = jnp.where(col < valid, f, -jnp.inf)
    p = quant_ops.quantize_u8(jax.nn.softmax(f, axis=-1), scale_p, zp_p,
                              rounding)
    return qmatmul_act(p, v_u8, scale_a=scale_p, zp_a=zp_p,
                       scale_b=scale_v, zp_b=zp_v, scale_c=scale_c,
                       zp_c=zp_c, rounding=rounding)


def decode_attention(q_u8, k_u8, v_u8, valid, *, backend: str = "auto",
                     interpret: bool = False, **kw):
    """Cached-decode attention dispatch.

    q [B, H, 1, D] u8, k/v [B, H, T, D] u8 caches, ``valid`` the live
    length (scalar, [B], or [B,1,1,1]) -> u8 [B, H, 1, D].

    'auto' -> the Pallas kernel on TPU (the composed path's in-scan
    lowering is the measured decode bottleneck, see the section comment);
    elsewhere the composed XLA path.  The kernel's f32 dots match the
    composed i32 accumulator bit-for-bit only while T <= 1024 (the 2^24
    exact-integer bound, see the kernel comment), so 'auto' falls back
    to XLA for longer caches; an explicit backend='pallas' with T > 1024
    raises rather than silently break the cached==full-forward invariant.
    """
    bsz, n_heads, one, d = q_u8.shape
    if one != 1:
        raise ValueError(f"decode_attention expects one query row, got "
                         f"{q_u8.shape}")
    t_cache = k_u8.shape[-2]
    if backend == "auto":
        backend = ("pallas" if jax.default_backend() == "tpu"
                   and t_cache <= 1024 else "xla")
    elif backend == "pallas" and t_cache > 1024:
        raise ValueError(
            f"decode_attention backend='pallas' requires cache length "
            f"<= 1024 for bit-exactness (got T={t_cache}); use 'auto' "
            f"or 'xla'")
    v_arr = jnp.asarray(valid, jnp.int32)
    if backend != "pallas":
        return decode_attention_xla(
            q_u8, k_u8, v_u8,
            v_arr.reshape(bsz, 1, 1, 1) if v_arr.ndim else v_arr, **kw)
    valid_b = (jnp.broadcast_to(v_arr.reshape(-1), (bsz,))
               if v_arr.ndim <= 1 else v_arr.reshape(bsz))
    rounding = kw.pop("rounding", "trunc")
    alpha = kw.pop("alpha")
    mult_s = (jnp.float32(kw["scale_q"]) * jnp.float32(kw["scale_k"])
              * jnp.float32(alpha) / jnp.float32(kw["scale_s"]))
    mult_o = (jnp.float32(kw["scale_p"]) * jnp.float32(kw["scale_v"])
              / jnp.float32(kw["scale_c"]))
    rb = 0.5 if rounding == "nearest" else 0.0
    fparams = jnp.stack([
        mult_s, jnp.float32(kw["zp_s"]), jnp.float32(kw["scale_s"]),
        jnp.float32(kw["scale_p"]), jnp.float32(kw["zp_p"]), mult_o,
        jnp.float32(kw["zp_c"]), jnp.float32(rb),
        jnp.float32(0), jnp.float32(0), jnp.float32(0), jnp.float32(0),
    ])
    iparams = jnp.asarray([128 - int(kw["zp_q"]), 128 - int(kw["zp_k"]),
                           128 - int(kw["zp_p"]), 128 - int(kw["zp_v"])],
                          jnp.int32)
    out = _decode_attn_pallas_impl(q_u8.reshape(bsz, n_heads, d),
                                   k_u8, v_u8, valid_b, fparams, iparams,
                                   interpret=interpret)
    return out.reshape(bsz, n_heads, 1, d)
