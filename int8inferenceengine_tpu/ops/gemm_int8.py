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

def _qgemm_kernel(a_ref, w_ref, oc_ref, mult_ref, out_ref, acc_ref, *,
                  zp_c: int, relu: bool, n_k: int, round_bias: float = 0.0):
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
        q = jnp.clip(q, 0.0, 255.0) + jnp.float32(round_bias)
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
    static_argnames=("zp_c", "relu", "round_bias"),
)
def _qgemm_pallas_impl(a_u8, w_s8_kn, oc, mult, *, zp_c, relu,
                       round_bias=0.0):
    m, k = a_u8.shape
    k2, n = w_s8_kn.shape
    assert k == k2, (a_u8.shape, w_s8_kn.shape)

    m_p, k_p, n_p = _round_up(m, 128), _round_up(k, 128), _round_up(n, 128)
    if (m_p, k_p) != (m, k):
        a_u8 = jnp.pad(a_u8, ((0, m_p - m), (0, k_p - k)))
    if (k_p, n_p) != (k, n):
        w_s8_kn = jnp.pad(w_s8_kn, ((0, k_p - k), (0, n_p - n)))
    if n_p != n:
        oc = jnp.pad(oc, (0, n_p - n))
        mult = jnp.pad(mult, (0, n_p - n))
    oc2d = oc.reshape(1, n_p)
    mult2d = mult.reshape(1, n_p)

    tm = _pick_tile(m_p)
    tn = _pick_tile(n_p)
    tk = _pick_tile(k_p, (2048, 1024, 512, 256, 128))
    n_k = k_p // tk

    grid = (m_p // tm, n_p // tn, n_k)
    kernel = functools.partial(
        _qgemm_kernel, zp_c=int(zp_c), relu=relu, n_k=n_k,
        round_bias=round_bias,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_p, n_p), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n_p * k_p,
            bytes_accessed=m_p * k_p + k_p * n_p + m_p * n_p,
            transcendentals=0,
        ),
    )(a_u8, w_s8_kn, oc2d, mult2d)
    if (m_p, n_p) != (m, n):
        out = out[:m, :n]
    return out


def qgemm_pallas(a_u8, w_s8_kn, oc, *, scale_a, zp_a, scale_w, scale_c, zp_c,
                 relu=False, rounding: str = "trunc"):
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
    return _qgemm_pallas_impl(a_u8, w_s8_kn, oc, mult, zp_c=int(zp_c),
                              relu=relu,
                              round_bias=0.5 if rounding == "nearest"
                              else 0.0)


# ---------------------------------------------------------------------------
# XLA fallback (identical semantics; also the kernel's differential oracle)
# ---------------------------------------------------------------------------

def qgemm_xla(a_u8, w_s8_kn, oc, *, scale_a, zp_a, scale_w, scale_c, zp_c,
              relu=False, rounding: str = "trunc"):
    """Same contract as :func:`qgemm_pallas`, via lax.dot_general.

    ``oc`` here must also carry the recentering term: we subtract 128 before
    the dot so both backends share one offset vector.
    """
    a = (a_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    acc = lax.dot_general(
        a, w_s8_kn,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    c = acc + oc.reshape(1, -1)
    mult = _mult_vector(scale_a, scale_w, scale_c, w_s8_kn.shape[1])
    q = c.astype(jnp.float32) * mult.reshape(1, -1) + jnp.float32(zp_c)
    q = jnp.clip(q, 0.0, 255.0)
    if rounding == "nearest":
        q = q + jnp.float32(0.5)
    qi = q.astype(jnp.int32)
    if relu:
        qi = jnp.maximum(qi, int(zp_c))
    return qi.astype(jnp.uint8)


def qgemm(a_u8, w_s8_kn, oc, *, backend: str = "auto", **kw):
    """Dispatch between the Pallas kernel and the XLA path.

    'auto' is shape-aware on TPU.  A pallas_call is a fusion barrier — XLA
    must materialize padded operands around it — so the kernel only pays
    when its tiles fit: K 128-aligned AND (N 128-aligned OR a tiny
    classifier head N < 128, where XLA's s8 dot is poor — forcing the
    N=10 AlexNet head to XLA cost 7% end-to-end).  Otherwise dot_general
    wins (measured sweep, ViT-Tiny INT8 b128: all-XLA 7,985 img/s,
    K-aligned-mixed 6,808, all-Pallas 5,897 — its profile showed 27% of
    runtime in reshape/copy/pad at kernel boundaries; AlexNet b100:
    all-Pallas 63.9-64.9k, XLA-head 59.7k)."""
    if a_u8.dtype != jnp.uint8:
        raise TypeError(
            f"qgemm activations must be uint8 codes, got {a_u8.dtype} "
            "(the kernel recenters u8 -> s8 internally)")
    if backend == "auto":
        k, n = w_s8_kn.shape
        fits = k % 128 == 0 and (n % 128 == 0 or n < 128)
        backend = ("pallas" if jax.default_backend() == "tpu" and fits
                   else "xla")
    if backend == "pallas":
        return qgemm_pallas(a_u8, w_s8_kn, oc, **kw)
    return qgemm_xla(a_u8, w_s8_kn, oc, **kw)
