"""Quantized GEMM: u8 activations x s8 weights -> u8 outputs, on the MXU.

This is the TPU-native replacement for the reference's MKL
``cblas_gemm_s8u8s32`` + ``down_scale`` pipeline (reference:
src/fully_connected.cc:22-52, src/conv2d.cc:100-142,
src/quantize_utils.cc:27-36).

Design
------
The TPU MXU multiplies s8 x s8 -> s32.  The reference's activations are
*unsigned* u8, so we recenter them on the fly: ``a' = a - 128`` maps u8 to s8
exactly and is a single XOR of the sign bit (``a ^ 0x80`` reinterpreted as
int8).  The recentering term folds into the per-output-channel offset the
reference already computes for zero-point correction
(src/fully_connected.cc:31-38, src/conv2d.cc:117-124):

    C[m,n] = sum_k a[m,k] * w[n,k] + oc[n]
           = sum_k (a[m,k]-128) * w[n,k]  +  (128 - zp_a) * rowsum_w[n]
             + trunc(q_bias[n] / s_a)                      <- bias in s32 domain

Everything after the s32 accumulator is the reference's ``down_scale``
epilogue, fused into the kernel: dequant by ``s_a*s_w``, requant to the
layer's calibrated ``(s_c, zp_c)``, clip to [0,255], truncate, optionally
ReLU-at-zero-point (which the reference runs as a separate pass,
src/functional.cc:15-26 — fusing it here is free).

Two interchangeable backends with identical semantics:

* ``qgemm_pallas`` — Pallas MXU kernel, grid over (M, N, K) tiles with an
  f32/s32 VMEM accumulator and the fused epilogue on the last K step.
* ``qgemm_xla``    — pure ``lax.dot_general`` path; runs anywhere (CPU tests,
  shard_map dry-runs) and serves as the differential oracle for the kernel.

Mosaic notes (verified on TPU v5e): s16 vector subtract and f32->u8 casts are
unsupported, hence the XOR recentering and the s32->s8->bitcast-u8 store.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile(dim: int, candidates=(512, 256, 128)) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return dim


def compute_offset(q_bias: jnp.ndarray, rowsum_w: jnp.ndarray,
                   scale_a: float, zp_a, *, recentered: bool) -> jnp.ndarray:
    """Per-output-channel s32 offset: zero-point correction + bias fold.

    Matches the reference's oc vector (conv2d.cc:117-124) with the bias
    folded in (``trunc(q_b/s_a)``), plus the ``+128*rowsum_w`` recentering
    term when the kernel consumes sign-flipped activations.
    """
    base = 128 if recentered else 0
    zp_term = (base - int(zp_a)) * rowsum_w
    bias_term = (q_bias.astype(jnp.float32) / jnp.float32(scale_a)).astype(jnp.int32)
    return zp_term + bias_term


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (|err| < 1.5e-7).

    Mosaic has no erf primitive (``lax.erf`` fails to lower), and 1.5e-7
    absolute error is far below one u8 code at any calibrated output grid,
    so the fused-gelu epilogue matches the composed XLA path to +-1 code
    (only values within ~1e-7 of a truncation boundary can flip)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + jnp.float32(0.3275911) * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


# Activation epilogues fusable into the GEMM kernel (same formulas as
# ops/functional.ACTIVATIONS; gelu via _erf — see its docstring).  Fusing
# the following QuantAct into the kernel epilogue keeps the accumulator in
# registers instead of writing u8 codes to HBM and re-reading them for a
# standalone transcendental pass (ViT-Tiny's 12 gelu passes on
# u8[25216,768] cost 0.343 ms EACH standalone).
KERNEL_ACTS = {
    "relu": lambda x: jnp.maximum(x, 0.0),
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "hardsigmoid": lambda x: jnp.clip(x + 3.0, 0.0, 6.0) / 6.0,
    "hardswish": lambda x: x * (jnp.clip(x + 3.0, 0.0, 6.0) / 6.0),
    "sigmoid": lambda x: 1.0 / (1.0 + jnp.exp(-x)),
    "silu": lambda x: x * (1.0 / (1.0 + jnp.exp(-x))),
    "gelu": lambda x: 0.5 * x * (1.0 + _erf(x * jnp.float32(2 ** -0.5))),
}


def _qgemm_kernel(a_ref, w_ref, oc_ref, mult_ref, ap_ref, out_ref, acc_ref,
                  *, zp_c: int, relu: bool, n_k: int,
                  round_bias: float = 0.0, act: str | None = None):
    """One (TM, TN) output tile; grid dim 2 iterates K tiles.

    ``mult_ref`` is the per-output-channel requant multiplier
    ``s_a * s_w[n] / s_c`` as a [1, TN] f32 row — an input rather than a
    static constant so per-channel weight scales work and one compiled
    kernel serves every layer of a given shape.  The fused single multiply
    keeps qgemm_pallas and qgemm_xla bit-identical (one rounding), at the
    cost of an occasional off-by-one code vs down_scale's two-step float
    order on exact truncation boundaries.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # u8 -> s8 recentering: (a ^ 0x80) as int8 == a - 128.
    a = pltpu.bitcast(a_ref[:] ^ jnp.uint8(0x80), jnp.int8)
    acc_ref[:] += lax.dot_general(
        a, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k - 1)
    def _():
        c = acc_ref[:] + oc_ref[:]
        q = c.astype(jnp.float32) * mult_ref[:] + jnp.float32(zp_c)
        q = jnp.clip(q, 0.0, 255.0)
        if round_bias:          # static: emit the add only under 'nearest'
            q = q + jnp.float32(round_bias)
        if act is not None:
            # Fused QuantAct epilogue: replay the composed path's u8 grid
            # (floor == the C-cast on non-negatives), dequant at this
            # layer's (scale, zp), apply the activation, requant at the
            # act layer's calibrated grid — all in registers.
            codes = jnp.floor(q)
            x = (codes - jnp.float32(zp_c)) * ap_ref[0]
            y = KERNEL_ACTS[act](x)
            q = jnp.clip(y / ap_ref[1] + ap_ref[2], 0.0, 255.0)
            if round_bias:
                q = q + jnp.float32(round_bias)
        qi = q.astype(jnp.int32)           # rounds toward zero, like C++
        if relu:
            qi = jnp.maximum(qi, zp_c)     # ReLU at zero_point, fused
        out_ref[:] = pltpu.bitcast((qi - 128).astype(jnp.int8), jnp.uint8) ^ jnp.uint8(0x80)


def _mult_vector(scale_a, scale_w, scale_c, n: int) -> jnp.ndarray:
    """Requant multiplier ``s_a * s_w / s_c`` as an f32 [N] vector.

    ``scale_w`` may be a python float (per-tensor, reference semantics) or an
    [N] array (per-channel extension).
    """
    mult = (jnp.float32(scale_a) * jnp.asarray(scale_w, jnp.float32)
            / jnp.float32(scale_c))
    return jnp.broadcast_to(mult, (n,))


@functools.partial(
    jax.jit,
    static_argnames=("zp_c", "relu", "round_bias", "act"),
)
def _qgemm_pallas_impl(a_u8, w_s8_kn, oc, mult, ap, *, zp_c, relu,
                       round_bias=0.0, act=None):
    """No boundary copies: partial tail blocks are handled by Pallas's
    masked stores (M and N tails — garbage accumulator rows/columns never
    escape the kernel), so unaligned M/N cost nothing.  Unaligned K runs
    as ONE K block (no K grid): splitting an unaligned K would read
    out-of-bounds activation garbage against out-of-bounds weight garbage
    inside real output tiles, while a whole-K block keeps every read
    in bounds (Mosaic masks the lane tail of the dot itself).  Verified
    bit-exact vs qgemm_xla on a v5e for M25216/K192/N{192,768},
    M100/K784/N128; the 192-dim case runs 0.033 ms vs the 0.443 ms
    XLA's unaligned-int8 emitter took inside ViT (13x)."""
    m, k = a_u8.shape
    k2, n = w_s8_kn.shape
    assert k == k2, (a_u8.shape, w_s8_kn.shape)

    oc2d = oc.reshape(1, n)
    mult2d = mult.reshape(1, n)

    # Block shapes are 128-aligned even when the array isn't: a partial
    # (or over-sized) block reads garbage out of bounds and its stores are
    # masked, so the silicon runs full tiles either way — but aligned
    # blocks keep the MXU lanes full (an unaligned tn=10 head block ran
    # the dot on 10 of 128 lanes; AlexNet b100 lost 9% end-to-end).
    tm = min(512, _round_up(m, 128))
    tn = (_round_up(n, 128) if n <= 512
          else next((c for c in (512, 256) if n % c == 0), 256))
    if k % 128 == 0:
        tk = _pick_tile(k, (2048, 1024, 512, 256, 128))
    else:
        tk = k                      # single K block; see docstring
    n_k = pl.cdiv(k, tk)

    grid = (pl.cdiv(m, tm), pl.cdiv(n, tn), n_k)
    kernel = functools.partial(
        _qgemm_kernel, zp_c=int(zp_c), relu=relu, n_k=n_k,
        round_bias=round_bias, act=act,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + k * n + m * n,
            transcendentals=m * n if act in
            ("sigmoid", "silu", "gelu") else 0,
        ),
    )(a_u8, w_s8_kn, oc2d, mult2d, ap)


def qgemm_pallas(a_u8, w_s8_kn, oc, *, scale_a, zp_a, scale_w, scale_c, zp_c,
                 relu=False, rounding: str = "trunc", act=None):
    """u8[M,K] x s8[K,N] (+oc[N]) -> u8[M,N] requantized to (scale_c, zp_c).

    ``w_s8_kn`` is the weight stored [K, N] (transposed once at convert
    time); ``oc`` must already contain the +128*rowsum recentering term
    (``compute_offset(..., recentered=True)``).  ``scale_w`` may be a float
    (per-tensor) or an [N] array (per-channel).

    Padding contract: K-padding rows of ``w_s8_kn`` must be zero (so garbage
    activation padding contributes nothing); M/N are padded here and sliced
    on return.
    """
    mult = _mult_vector(scale_a, scale_w, scale_c, w_s8_kn.shape[1])
    act_name, ap = None, jnp.zeros((3,), jnp.float32)
    if act is not None:
        act_name, act_scale, act_zp = act
        if relu:
            raise ValueError("act epilogue and fuse_relu are exclusive")
        ap = jnp.asarray([jnp.float32(scale_c), jnp.float32(act_scale),
                          jnp.float32(act_zp)], jnp.float32)
    return _qgemm_pallas_impl(a_u8, w_s8_kn, oc, mult, ap, zp_c=int(zp_c),
                              relu=relu, act=act_name,
                              round_bias=0.5 if rounding == "nearest"
                              else 0.0)


# ---------------------------------------------------------------------------
# XLA fallback (identical semantics; also the kernel's differential oracle)
# ---------------------------------------------------------------------------

def qgemm_xla(a_u8, w_s8_kn, oc, *, scale_a, zp_a, scale_w, scale_c, zp_c,
              relu=False, rounding: str = "trunc", act=None):
    """Same contract as :func:`qgemm_pallas`, via lax.dot_general.

    ``oc`` here must also carry the recentering term: we subtract 128 before
    the dot so both backends share one offset vector.  The ``act``
    epilogue here uses the layer-level ACTIVATIONS table (exact erf gelu),
    so it is bit-identical to running the composed Linear + QuantAct —
    the kernel's _erf differs by at most one code (see _erf)."""
    a = (a_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    acc = lax.dot_general(
        a, w_s8_kn,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    c = acc + oc.reshape(1, -1)
    return _requant_epilogue(c, scale_a=scale_a, scale_w=scale_w,
                             scale_c=scale_c, zp_c=zp_c, relu=relu,
                             rounding=rounding, act=act)


def _requant_epilogue(c, *, scale_a, scale_w, scale_c, zp_c, relu=False,
                      rounding: str = "trunc", act=None):
    """The ``down_scale`` requant tail on an s32 accumulator that already
    includes the offset vector (zero-point correction + bias fold).

    Shared by :func:`qgemm_xla` and :func:`qgemm_row_parallel` so the
    tensor-parallel path can't drift from the single-device float order
    (reference semantics: quantize_utils.cc:27-36)."""
    n = c.shape[-1]
    mult = _mult_vector(scale_a, scale_w, scale_c, n)
    q = c.astype(jnp.float32) * mult.reshape(1, -1) + jnp.float32(zp_c)
    q = jnp.clip(q, 0.0, 255.0)
    if rounding == "nearest":
        q = q + jnp.float32(0.5)
    qi = q.astype(jnp.int32)
    if act is not None:
        from .functional import ACTIVATIONS
        act_name, act_scale, act_zp = act
        if relu:
            raise ValueError("act epilogue and fuse_relu are exclusive")
        x = ((qi.astype(jnp.float32) - jnp.float32(zp_c))
             * jnp.float32(scale_c))
        from .quant import quantize_u8
        return quantize_u8(ACTIVATIONS[act_name](x), act_scale, act_zp,
                           rounding)
    if relu:
        qi = jnp.maximum(qi, int(zp_c))
    return qi.astype(jnp.uint8)


def qgemm_row_parallel(a_u8_local, w_s8_kn_local, rowsum_local, q_bias, *,
                       axis_name, scale_a, zp_a, scale_w, scale_c, zp_c,
                       relu=False, rounding: str = "trunc", act=None):
    """Row-parallel (input-channel-sharded) quantized GEMM under shard_map.

    Megatron-style second-GEMM tensor parallelism, INT8-native: each shard
    holds a contiguous K-slice of the weight ([K_local, N]) and the
    matching activation slice; partial s32 accumulators (plus each shard's
    LOCAL recentering correction) are ``psum``med over ``axis_name`` —
    integer addition is associative, so the summed accumulator is
    BIT-IDENTICAL to the unsharded one — and the bias fold + requant
    epilogue run once on the replicated result.

    ``rowsum_local`` is the per-output-channel sum over this shard's K
    rows only (parallel/sharding.py stacks the per-shard rowsums at
    placement time); ``q_bias`` is replicated.
    """
    a = (a_u8_local.astype(jnp.int32) - 128).astype(jnp.int8)
    acc = lax.dot_general(
        a, w_s8_kn_local,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    corr = (128 - int(zp_a)) * rowsum_local           # local K rows only
    acc = lax.psum(acc + corr.reshape(1, -1), axis_name)
    bias_term = (q_bias.astype(jnp.float32)
                 / jnp.float32(scale_a)).astype(jnp.int32)
    c = acc + bias_term.reshape(1, -1)
    return _requant_epilogue(c, scale_a=scale_a, scale_w=scale_w,
                             scale_c=scale_c, zp_c=zp_c, relu=relu,
                             rounding=rounding, act=act)


def qgemm(a_u8, w_s8_kn, oc, *, backend: str = "auto", **kw):
    """Dispatch between the Pallas kernel and the XLA path.

    'auto' is Pallas on TPU for every shape the kernel supports.  The
    kernel handles unaligned M/N via masked tail blocks and unaligned K
    as a single K block (no boundary pad/copies — an earlier version
    padded explicitly, which made a pallas_call a materialization
    barrier and lost to XLA on unaligned shapes; see git history for
    that sweep).  XLA's unaligned-int8 dot emitter is catastrophic
    in-model (ViT-Tiny's 192-dim Linears: 0.443 ms each, ~1% of MXU
    peak, vs 0.033 ms for the copy-free kernel).  The single guard:
    an unaligned K must fit one VMEM block (K <= 4096), else XLA.

    Two measured exceptions (2026-08-19, v5e):

    * tiny-M x huge-N — the decode step's vocab head, [8, 768] x
      [768, 50257] — runs 240us in the kernel (a ~200-step grid of
      mostly-padded M=128 blocks) vs 54.5us for XLA's emitter (87% of
      the 47us weight-read SoL), so M <= 16 with N >= 16384 dispatches
      XLA.
    * small-M on ALIGNED K (K%128==0): XLA's emitter wins every
      measured gpt2-small decode shape.  Chained-scan sweep, us/call:
      K=768  N=768:  M=8 3.1/2.3  M=16 4.3/1.2  M=32 5.2/1.9  M=64 4.8/1.8
      K=768  N=3072: M=8 9.1/5.0  M=16 9.6/5.2  M=32 9.5/4.6  M=64 9.5/5.3
      K=3072 N=768:  M=8 6.6/5.0  M=16 7.9/4.7  M=32 6.7/5.5  M=64 6.9/5.8
      (pallas/xla; the kernel pads every M block to 128 so small real M
      wastes MXU rows).  So M <= 64 with aligned K dispatches XLA —
      BOUNDED to the measured K/N envelope (K, N <= 4096): CNN
      classifier Linears at small batch (AlexNet fc1 [64, 9216], VGG
      [64, 25088]) sit behind recorded benchmark numbers measured on
      the Pallas path and stay there until someone sweeps them.
      Unaligned K stays Pallas at any M — XLA's unaligned-int8 emitter
      forces transposed layouts in-model (the ViT 192-dim catastrophe
      above), a layout property independent of M."""
    if a_u8.dtype != jnp.uint8:
        raise TypeError(
            f"qgemm activations must be uint8 codes, got {a_u8.dtype} "
            "(the kernel recenters u8 -> s8 internally)")
    if backend == "auto":
        k, n = w_s8_kn.shape
        fits = k % 128 == 0 or k <= 4096
        decode_head = a_u8.shape[0] <= 16 and n >= 16384
        small_m_aligned = (a_u8.shape[0] <= 64 and k % 128 == 0
                           and k <= 4096 and n <= 4096)
        backend = ("pallas" if jax.default_backend() == "tpu" and fits
                   and not decode_head and not small_m_aligned else "xla")
    if backend == "pallas":
        return qgemm_pallas(a_u8, w_s8_kn, oc, **kw)
    return qgemm_xla(a_u8, w_s8_kn, oc, **kw)


# ---------------------------------------------------------------------------
# Multi-head GEMM: several weight heads sharing one input, one kernel call
# ---------------------------------------------------------------------------
#
# Attention computes wq/wk/wv (and a transformer block ~6 GEMMs) on the
# SAME activations; at decode batch sizes each pallas_call's fixed cost
# dominates, so fusing the three into one [K, Nq+Nk+Nv] GEMM cuts launch
# count 3x.  Each head keeps its own calibrated (scale, zp): the requant
# multiplier was always a per-column vector, and the vector-zero-point
# kernel below makes zp per-column data too.  DEFAULT-ON since the
# on-chip A/B (2026-08-19: merged-XLA 0.791 ms/step vs composed 0.828 at
# gpt2-small b8 decode; QuantConfig.fuse_qkv='auto') — outputs are
# bit-identical to the separate calls by construction (verified on-chip
# token-for-token).


def _qgemm_kernel_vzp(a_ref, w_ref, oc_ref, mult_ref, zp_ref, out_ref,
                      acc_ref, *, n_k: int, round_bias: float = 0.0):
    """_qgemm_kernel with the zero point as a [1, TN] f32 row (heads with
    different calibrated zps share one tile); no relu/act epilogue."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = pltpu.bitcast(a_ref[:] ^ jnp.uint8(0x80), jnp.int8)
    acc_ref[:] += lax.dot_general(
        a, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k - 1)
    def _():
        c = acc_ref[:] + oc_ref[:]
        q = c.astype(jnp.float32) * mult_ref[:] + zp_ref[:]
        q = jnp.clip(q, 0.0, 255.0)
        if round_bias:
            q = q + jnp.float32(round_bias)
        qi = q.astype(jnp.int32)
        out_ref[:] = pltpu.bitcast((qi - 128).astype(jnp.int8),
                                   jnp.uint8) ^ jnp.uint8(0x80)


@functools.partial(jax.jit, static_argnames=("round_bias",))
def _qgemm_pallas_vzp(a_u8, w_s8_kn, oc, mult, zp, *, round_bias=0.0):
    m, k = a_u8.shape
    k2, n = w_s8_kn.shape
    assert k == k2
    tm = min(512, _round_up(m, 128))
    tn = (_round_up(n, 128) if n <= 512
          else next((c for c in (512, 256) if n % c == 0), 256))
    tk = (_pick_tile(k, (2048, 1024, 512, 256, 128)) if k % 128 == 0
          else k)
    n_k = pl.cdiv(k, tk)
    kernel = functools.partial(_qgemm_kernel_vzp, n_k=n_k,
                               round_bias=round_bias)
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, tm), pl.cdiv(n, tn), n_k),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + k * n + m * n,
            transcendentals=0,
        ),
    )(a_u8, w_s8_kn, oc.reshape(1, -1), mult.reshape(1, -1),
      zp.reshape(1, -1))


def qgemm_multi(a_u8, parts, *, scale_a, zp_a, rounding: str = "trunc",
                backend: str = "auto"):
    """One GEMM over several heads sharing input ``a_u8``.

    ``parts``: list of dicts with keys ``w_s8_kn`` ([K, N_i] s8), ``oc``
    ([N_i] s32, recentered), ``scale_w`` (float or [N_i]), ``scale_c``,
    ``zp_c``.  Returns one u8 array per part, bit-identical to calling
    :func:`qgemm` per part (same per-column epilogue math)."""
    if a_u8.dtype != jnp.uint8:
        raise TypeError("qgemm_multi activations must be uint8 codes")
    w = jnp.concatenate([p["w_s8_kn"] for p in parts], axis=1)
    oc = jnp.concatenate([p["oc"] for p in parts])
    mult = jnp.concatenate([
        _mult_vector(scale_a, p["scale_w"], p["scale_c"],
                     p["w_s8_kn"].shape[1]) for p in parts])
    zp = jnp.concatenate([
        jnp.full((p["w_s8_kn"].shape[1],), jnp.float32(p["zp_c"]))
        for p in parts])
    rb = 0.5 if rounding == "nearest" else 0.0
    k, n = w.shape
    if backend == "auto":
        # Same measured rule as qgemm 'auto': XLA for small-M aligned-K
        # (decode A/B 2026-08-19, v5e, gpt2-small b8: merged-XLA 0.791
        # ms/step vs merged-Pallas 0.875 vs composed 0.828).
        fits = k % 128 == 0 or k <= 4096
        small_m_aligned = (a_u8.shape[0] <= 64 and k % 128 == 0
                           and k <= 4096 and n <= 4096)
        backend = ("pallas" if jax.default_backend() == "tpu" and fits
                   and not small_m_aligned else "xla")
    if backend == "pallas":
        out = _qgemm_pallas_vzp(a_u8, w, oc, mult, zp, round_bias=rb)
    else:
        a = (a_u8.astype(jnp.int32) - 128).astype(jnp.int8)
        acc = lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        q = (acc + oc.reshape(1, -1)).astype(jnp.float32) \
            * mult.reshape(1, -1) + zp.reshape(1, -1)
        q = jnp.clip(q, 0.0, 255.0)
        if rounding == "nearest":
            q = q + jnp.float32(0.5)
        out = q.astype(jnp.int32).astype(jnp.uint8)
    outs, c0 = [], 0
    for p in parts:
        n_i = p["w_s8_kn"].shape[1]
        outs.append(out[:, c0:c0 + n_i])
        c0 += n_i
    return outs
