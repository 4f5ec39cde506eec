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
# fparams layout for the decode kernel (f32 SMEM vector)
# ---------------------------------------------------------------------------

_MULT_S, _ZP_S, _S_S, _S_P, _ZP_P, _MULT_O, _ZP_C, _RB, \
    _C_Q, _C_K, _C_P, _C_V = range(12)


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
    conv kernel study (see conv.py's dispatch note): beating XLA's
    fusion machinery on bandwidth-bound chains needs a Mosaic-emitter-
    level kernel, not a Pallas grid.  The losing prefill Pallas kernel
    was deleted after that measurement (round 2; it lived in this file
    through commit 4848cb5) — cached DECODE attention is the regime
    where a kernel wins, and keeps one (``_decode_attn_kernel_flat``)."""
    if backend == "auto":
        backend = "xla"
    if backend == "pallas":
        raise ValueError(
            "the prefill fused-attention Pallas kernel was removed: the "
            "composed XLA path beat it at every measured shape (ViT-Tiny "
            "0.063 vs 0.153 ms/op, GPT-ish 0.074 vs 0.502; see this "
            "docstring). Use 'xla'/'off'; the decode-path kernel "
            "(decode_attention) is unaffected")
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
# The Pallas kernel takes the layout back.  Three revisions got here
# (git history): a per-head static loop (45 us/call — pure MXU issue
# latency over ~100 tiny M=1 dots), a block-diagonal all-heads version
# on [B, H, T, D] (21.8 us — floored by the full-max_len VMEM copy:
# Mosaic cannot partially slice the 64-lane D dim of a tiled memref),
# and the surviving FLAT T-major kernel below (15 us at decode-typical
# live lengths, work and DMA proportional to ``valid``).  The integer
# accumulators are bit-identical to qmatmul_act's throughout; the f32
# segments (requant epilogues, softmax) replay the composed op order
# exactly (same mult construction, division by s_p, trunc-vs-nearest
# ordering).  Masked positions quantize to exactly zp_p and contribute
# exactly zero through the P@V zero-point correction — the u8-KV-cache
# invariant the composed path documents.
#
# ``valid`` is an SMEM i32 vector [B]: generate() broadcasts its scalar
# position, the serving engine passes per-slot positions.

# iparams layout (i32 SMEM vector): the integer zero-point offsets
_I_CQ, _I_CK, _I_CP, _I_CV = range(4)


# ---------------------------------------------------------------------------
# Flat T-major decode attention: cache [B, T, H*D], DMA and compute ~ valid
# ---------------------------------------------------------------------------
#
# The [B, H, T, D] kernels above must DMA the FULL static cache into VMEM
# every step (Mosaic cannot partially slice the 64-lane D dim of a tiled
# memref), so even with dead-block compute skipped the call floors at the
# max_len cache read (~19 us at T=512 when only 64 rows are live).  The
# T-major FLAT layout fixes that structurally:
#
#   * cache rows are [H*D] — contiguous, 128-aligned — so the kernel
#     manually DMAs ONLY the live _DEC_BLK-row tiles: HBM traffic per
#     step scales with the live length, not max_len;
#   * the per-step cache append is one contiguous [B, 1, H*D] row write;
#   * the query rides a BLOCK-DIAGONAL [H, H*D] matrix (head h's row
#     holds q' in its own d-segment, zeros elsewhere), so ONE
#     [H, C] x [C, BLK] dot yields exact per-head scores directly — no
#     cross-head waste, no diagonal extraction on the scores;
#   * P@V accumulates [H, C] per-block dots in i32 and extracts the
#     per-head diagonal d-segments once at the end ([H, H, D] — 16x
#     smaller than the score-side extraction the layout removes).
#
# Exactness: identical integer math to the composed path.  Corrections
# fold into the operands (q' = q - zp_q, p' = p - zp_p); every per-block
# f32 dot stays below 2^24 (255*128*BLK = 4.2M at BLK=128) and the
# cross-block accumulation is i32 — so unlike the [B, H, T, D] kernels
# there is NO max_len bound: the flat kernel is exact for any T.
# Dead positions quantize to exactly zp_p and contribute exactly zero,
# so skipped blocks are exact skips (the u8-KV-cache invariant).


_DEC_BLK = 128      # preferred T-block (rows per DMA tile)


def _dec_blk(t: int) -> int:
    """Largest u8-sublane-aligned T-block that divides the cache length
    (0 = unsupported -> XLA fallback)."""
    for b in (_DEC_BLK, 64, 32):
        if t % b == 0:
            return b
    return 0


def kernel_eligible(t: int, c: int) -> bool:
    """The 'auto' kernel envelope on a TPU target: block-divisible cache
    length and 128-aligned cache rows.  On-chip evidence for the width
    rule: C=768 (gpt2 MHA, round 2, in-model winner) and C=128 (llama
    kv-compact, 2026-08-20: 0.107 vs 0.214 ms/step composed —
    tools/llama_decode_tpu.py); intermediate 128-multiples (384, 256 —
    TP head shards) are interpret-exact
    (tests/test_decode_attention.py::test_flat_kernel_headshard_widths)
    and share the C=128/768 lowering pattern (whole-row lane tiles);
    tools/decode_kernel_sweep.py measures them when a chip is up.
    Non-128-multiple widths (e.g. c_local=192 at a model-axis-4 shard)
    fall back to composed XLA.  ``__graft_entry__.dryrun_multichip``
    asserts this predicate for the TP decode geometries it runs."""
    return bool(_dec_blk(t)) and c % 128 == 0


def _decode_attn_kernel_flat(valid_ref, fp_ref, ip_ref, q_ref, k_ref,
                             v_ref, o_ref, kb0, kb1, vb0, vb1, s_scr,
                             a2_scr, ks0, ks1, vs0, vs1, *, n_heads: int,
                             n_kv: int, t: int, d: int, blk: int,
                             mq: int = 1):
    f32, i32, s8, bf16 = jnp.float32, jnp.int32, jnp.int8, jnp.bfloat16
    kbufs, ksems = (kb0, kb1), (ks0, ks1)
    vbufs, vsems = (vb0, vb1), (vs0, vs1)
    # mq query POSITIONS (speculative verify / chunked extend), n_heads
    # query heads each -> R = mq * H query rows.  Row j*H + r serves
    # position (base + j), query head (r % n_kv)*grp + r//n_kv.  The
    # m=1 index algebra survives unchanged because H % n_kv == 0:
    # (j*H + r) % n_kv == r % n_kv (the kv-segment mask) and
    # (j*H + r) // n_kv == j*grp + (r // n_kv) (the extraction slot).
    h = n_heads
    grp = h // n_kv
    r_rows = mq * h                                  # query rows R
    slots = mq * grp                                 # output rows
    c = n_kv * d                                     # cache row width
    nblk = t // blk
    b = pl.program_id(0)
    valid = valid_ref[b]          # base live length (position row 0)
    vmax = valid + (mq - 1)       # last row sees mq-1 more columns
    rb = fp_ref[_RB]
    c_q, c_k = ip_ref[_I_CQ], ip_ref[_I_CK]
    c_p, c_v = ip_ref[_I_CP], ip_ref[_I_CV]

    def dot_t(x, y):                                 # x [M,K] . y [N,K]^T
        return lax.dot_general(x, y, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32).astype(i32)

    def dot_n(x, y):                                 # x [M,K] . y [K,N]
        return lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32).astype(i32)

    # Block-diagonal query rows over the KV segments.  Rows are KV-MAJOR
    # within each group slot: row r serves query head (r % n_kv)*grp +
    # r//n_kv, whose kv head is r % n_kv — so ONE mask (seg == r % n_kv)
    # covers MHA (grp == 1: r % n_kv == r, the original head-diagonal)
    # and GQA alike.  MHA builds the diagonal in-kernel from the [1, C]
    # projection row (broadcast aligns because output segments == input
    # segments); GQA rows need q values at FOREIGN column offsets, which
    # is a relayout Mosaic rejects — so the wrapper pre-places the codes
    # (dead segments = code 128 -> recenter to 0) and the kernel only
    # recenters + masks.
    seg = lax.broadcasted_iota(i32, (r_rows, c), 1) // d  # col's kv head
    rowkv = lax.broadcasted_iota(i32, (r_rows, c), 0) % n_kv
    a8 = pltpu.bitcast(q_ref[0] ^ jnp.uint8(0x80), s8)   # [1|R, C]
    aqf = a8.astype(f32) + f32(c_q)                  # q - zp_q, exact ints
    aq_masked = jnp.where(seg == rowkv,
                          jnp.broadcast_to(aqf, (r_rows, c)), 0.0)
    aq_wide = aq_masked.astype(bf16)
    rowsum_aq = jnp.sum(aq_masked, axis=1,
                        keepdims=True).astype(i32)        # [R, 1]

    # Block walk: double-buffered prefetch of block tb+1 while
    # computing block tb (the serial copy->wait->compute version
    # measured 2x slower at full valid).  Live blocks are the prefix
    # [0, ceil(vmax/blk)) — vmax covers the LAST query row's horizon —
    # and block 0 is always live (valid >= 1 by contract).
    #
    # A v2 pipeline (cross-instance k-block-0 prefetch + early v0/v1
    # starts) was built and measured on-chip after the B-scaling study
    # (tools/decode_kernel_sweep.py: ~1.9 us/instance fixed cost):
    # per-call time at C=768 was UNCHANGED (18.3 us) and the C=128
    # llama path REGRESSED ~4 us/call in-model (0.107 -> 0.158 ms/step)
    # — the extra DMA issues cost more than the latency they hide, and
    # the per-instance floor is MXU issue latency (4 small dots) +
    # serial VPU work, not exposed DMA waits.  Cutting it further means
    # fewer, larger dots across batch rows, but each row contracts
    # against ITS OWN cache tile — a block-diagonal K operand would
    # cost more than it saves.  So: the simple walk, kept.
    #
    # Round 4 BUILT the merged-dot idea this note proposed —
    # ``_decode_attn_kernel_flat_merged`` below (one live-prefix DMA +
    # one dot per 512-column chunk per phase + live-prefix softmax),
    # measured faster at every in-model shape (gpt2 0.40 -> 0.37
    # ms/step, llama 0.19 -> 0.155; tools/decode_model_ab_v4.py) — and
    # is the 'auto' kernel.  This walk revision is kept selectable
    # (merged=False) as the bit-identity oracle for the merged kernel's
    # tests.
    #
    # start/wait conditions must pair EXACTLY: a start without its
    # wait (e.g. valid == 0 — an empty serving slot) would leak a
    # semaphore count into the next grid step's wait on the same sem.
    def walk(cp, bufs, compute):
        @pl.when(0 < vmax)
        def _():
            cp(0, 0).start()
        for tb in range(nblk):                       # static unroll
            if tb + 1 < nblk:
                @pl.when((tb + 1) * blk < vmax)
                def _(tb=tb):
                    cp(tb + 1, (tb + 1) % 2).start()

            @pl.when(tb * blk < vmax)
            def _(tb=tb):
                cp(tb, tb % 2).wait()
                compute(tb, bufs[tb % 2])
        # dead blocks: never copied, never computed

    def kcp(tb, side):
        return pltpu.make_async_copy(
            k_ref.at[b, pl.ds(tb * blk, blk), :], kbufs[side],
            ksems[side])

    def vcp(tb, side):
        return pltpu.make_async_copy(
            v_ref.at[b, pl.ds(tb * blk, blk), :], vbufs[side],
            vsems[side])

    def k_block(tb, buf):
        kf = pltpu.bitcast(buf[...] ^ jnp.uint8(0x80), s8) \
            .astype(bf16)                            # [BLK, C] k - 128
        scores = dot_t(aq_wide, kf)                  # [R, BLK] exact
        acc = scores + c_k * rowsum_aq
        codes = jnp.clip(
            acc.astype(f32) * fp_ref[_MULT_S] + fp_ref[_ZP_S],
            0.0, 255.0)
        codes = jnp.floor(codes + rb)
        s_scr[:, tb * blk:(tb + 1) * blk] = \
            (codes - fp_ref[_ZP_S]) * fp_ref[_S_S]

    walk(kcp, kbufs, k_block)
    # dead score regions stay garbage — the softmax mask covers them

    colio = lax.broadcasted_iota(i32, (r_rows, t), 1)
    # row j*H + r is position base + j: it sees valid + j columns
    rowj = lax.broadcasted_iota(i32, (r_rows, t), 0) // h
    x = jnp.where(colio < valid + rowj, s_scr[...], -jnp.inf)
    m = jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    pcodes = jnp.clip(p / fp_ref[_S_P] + fp_ref[_ZP_P], 0.0, 255.0)
    pcodes = jnp.floor(pcodes + rb)                  # [H, T]
    pz = pcodes + f32(c_p - 128)                     # p - zp_p (dead -> 0)

    a2_scr[...] = jnp.zeros((r_rows, c), i32)

    def v_block(tb, buf):
        vf = pltpu.bitcast(buf[...] ^ jnp.uint8(0x80), s8) \
            .astype(bf16)                            # [BLK, C] v - 128
        pzb = pz[:, tb * blk:(tb + 1) * blk].astype(bf16)
        a2_scr[...] += dot_n(pzb, vf)                # [H, C] i32 partials

    walk(vcp, vbufs, v_block)

    # row r's result lives in its kv segment [kv*D, (kv+1)*D) of its a2
    # row — flattening back is a column-wise row-select with the SAME
    # (seg == rowkv) mask as aq_wide: a sublane reduction per group
    # slot, no reshapes (Mosaic rejects the [H, C] -> [H, H, D]
    # minor-split shape cast).  Each group slot g reduces its n_kv rows
    # [g*n_kv, (g+1)*n_kv) to one head-merged kv-major row; grp == 1 is
    # the original single reduction.
    rowsum_pz = jnp.sum(pz, axis=1, keepdims=True).astype(i32)  # [R, 1]
    corr = jnp.broadcast_to(c_v * rowsum_pz, (r_rows, c))
    base = jnp.where(seg == rowkv, a2_scr[...] + corr, 0)  # [R, C] i32
    rowg = lax.broadcasted_iota(i32, (r_rows, c), 0) // n_kv
    rows = [jnp.sum(jnp.where(rowg == g, base, 0), axis=0, keepdims=True)
            for g in range(slots)]                  # slots x [1, C] exact
    acc2f = rows[0] if slots == 1 else jnp.concatenate(rows, axis=0)
    qo = jnp.clip(acc2f.astype(f32) * fp_ref[_MULT_O] + fp_ref[_ZP_C],
                  0.0, 255.0)
    qo = (qo + rb).astype(i32)
    o_ref[0] = pltpu.bitcast((qo - 128).astype(s8), jnp.uint8) \
        ^ jnp.uint8(0x80)                            # [grp, C]


# Exactness bound for the merged kernel's chunked V-phase dots: each f32
# MXU dot contracts at most _DEC_SUB positions, so the partial sums stay
# below 255 * 128 * 512 = 16,711,680 < 2^24 and f32 accumulation is
# exact; cross-chunk accumulation is i32 (same argument as the per-block
# walk, at 4x the granularity).  The K phase contracts the block-diagonal
# query (<= d <= 128 live columns per row: 255 * 128 * 128), safe at any
# chunk width.
_DEC_SUB = 512

# VMEM budget for the merged kernel's per-row cache-prefix buffers
# (2 * rows * T * C bytes; ~16 MB/core total, leave room for scores/
# accumulator scratch and the compiler's own buffers).
_DEC_ROWS_VMEM = 8 << 20


def _pick_rows(bsz: int, t: int, c: int) -> int:
    """Batch rows per grid instance for the merged kernel: the largest
    divisor of B (<= 8, code size) whose k/v prefix buffers fit the
    VMEM budget, for caches up to 1024 rows.  Any choice is
    bit-identical (per-row math is independent); this only sets the
    overhead/VMEM trade.  Measured (one v5e, 2026-08-20, honest static
    rows A/B after a jit-cache pitfall): T=512 C=768 rows=8 wins at
    high valid (17.8 -> 14.3 us at v=512) and is noise-level at low;
    T=2048 rows=2 REGRESSES 2.6x (47 -> 123 us at v=1900 — VMEM
    pressure throttles the prefix DMA) and rows=4 OOMs scoped VMEM —
    hence the t <= 1024 gate."""
    if t > 1024:
        return 1
    cap = max(1, _DEC_ROWS_VMEM // (2 * t * c))
    r = min(bsz, 8, cap)
    while bsz % r:
        r -= 1
    return r


def _decode_attn_kernel_flat_merged(valid_ref, fp_ref, ip_ref, q_ref,
                                    k_ref, v_ref, o_ref, kbuf, vbuf,
                                    s_scr, ksem, vsem, *,
                                    n_heads: int, n_kv: int, t: int,
                                    d: int, blk: int, mq: int = 1,
                                    rows: int = 1,
                                    window: int | None = None,
                                    softcap: float | None = None):
    """Merged-dot revision of the flat walk (the committed round-4 note
    above): ONE contiguous DMA of the live [L*blk, C] cache prefix per
    phase (a ``pl.when`` ladder over the live-block count L picks the
    copy size; exactly one branch fires since valid >= 1) and ONE dot
    per _DEC_SUB-column chunk — 2 * ceil(valid/512) MXU issues per
    instance instead of the walk's 2 * ceil(valid/128), with the VPU
    recenter/requant passes batched at the same granularity.  The
    per-instance floor the B-scaling study measured (~1.9 us: 4 small
    dots + serial VPU) is what this removes.

    ``rows`` batch rows share one grid instance (their 2*rows prefix
    DMAs all start before any compute, so row j+1's cache streams in
    behind row j's compute) — the remaining per-GRID-STEP overhead is
    paid B/rows times instead of B times.  Each row keeps its own
    buffers, semaphores, and valid ladder; the math per row is
    untouched, so any (rows, grid) split is bit-identical.

    Dead-region contract (same argument as the walk, coarser grain):
    buffer rows past the copied prefix are garbage but finite u8, so
    K-phase scores there are finite garbage masked to -inf before
    softmax, and V-phase probabilities there are EXACTLY zero (masked
    positions quantize to exactly zp_p), so 0 * garbage == 0 in f32.
    Integer math is bit-identical to the walk and the composed path.

    ``window`` (mistral-family sliding-window attention, static): each
    row attends only to columns [valid + j - window, valid + j), so the
    DMA'd region becomes a dynamic-start SEGMENT [lb*blk, hb*blk) (the
    block range covering row 0's lower edge through the last row's
    horizon) instead of the [0, hb*blk) prefix — decode DMA + compute
    are capped at ~window regardless of context length.  The span
    ladder replaces the prefix ladder; masks gain the absolute-column
    lower bound.  Masked-out history quantizes to exactly zp_p — the
    same exact-zero contract as the upper bound.

    **MHA (gpt2) floor study — round-5 VERDICT #3, measured 2026-08-21
    on one v5e (tools/mha_kernel_floor.py + tools/decode_profile.py).**
    The gpt2 bench number sat at 0.366-0.377 ms/step for three rounds
    while llama fell to 0.151; the decomposition says that is the
    component floor, not an unstudied gap:

      per-call cost, H12 D64 C768 T512 b8, rows=8 (ONE grid instance):
        valid     1     64    128   256   384   512
        us/call   8.0   7.7   8.1   8.6   10.4  12.4
        (walk kernel 14.8/25.2 at v=128/384; composed XLA 58.6/59.1)

    The valid SLOPE is 0.0105 us/position = at/under the naive HBM rate
    for the 12.3 KB/position live read (0.015 us) — the streaming part
    of the kernel is at speed of light.  What dominates decode-typical
    valids is the FIXED ~8 us/call: DMA issue+wait latency for the k/v
    prefix pair plus the serial in-VMEM chain (2 phase dots, f32
    softmax over [B*H, T], probability requant, P@V, per-head masked
    sublane extraction).  rows=8 already amortizes instance issue
    (rows=1 pays 10.9/16.0 us at the same points).

    Whole-step profile at the bench protocol (device_op_times, 64-step
    scan, 353 us/step inside the while):

        GEMM+epilogue fusions   164.3 us  vs ~160 us weight-read bound
        attention kernel x12    113.5 us  vs ~17 us DMA bound (fixed-
                                          cost dominated: 12 x ~8 us)
        head GEMM+argmax         23.0 us  (iota_reduce fusion)
        requant/add/LN glue     ~52 us    (convert_add + add_convert +
                                          multiply_reduce + dus)

    Named floor: the GEMMs are AT the weight bound and the attention
    cost is 12 serial kernel launches' fixed cost — reaching the 0.30
    ms target would need the fixed 8 us halved (kernel-internal DMA
    latency + serial VPU tail, not grid issue, not the streaming part).
    The GQA/llama geometry escapes it because C=128 shrinks both the
    tail (fewer segments) and the dots, not because MHA left a lever
    unpulled.  Kept as the committed study per the round-3 study
    clause.
    """
    f32, i32, s8, bf16 = jnp.float32, jnp.int32, jnp.int8, jnp.bfloat16
    h = n_heads
    grp = h // n_kv
    r_rows = mq * h
    slots = mq * grp
    c = n_kv * d
    nblk = t // blk
    pid = pl.program_id(0)
    rb = fp_ref[_RB]
    c_q, c_k = ip_ref[_I_CQ], ip_ref[_I_CK]
    c_p, c_v = ip_ref[_I_CP], ip_ref[_I_CV]

    def dot_t(x, y):                                 # x [M,K] . y [N,K]^T
        return lax.dot_general(x, y, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32).astype(i32)

    def dot_n(x, y):                                 # x [M,K] . y [K,N]
        return lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32).astype(i32)

    # Block-diagonal query-row masks (identical to the walk kernel; see
    # its comment for the kv-major row algebra); shared across rows.
    seg = lax.broadcasted_iota(i32, (r_rows, c), 1) // d
    rowkv = lax.broadcasted_iota(i32, (r_rows, c), 0) % n_kv
    rowg = lax.broadcasted_iota(i32, (r_rows, c), 0) // n_kv
    colio = lax.broadcasted_iota(i32, (r_rows, t), 1)
    rowj = lax.broadcasted_iota(i32, (r_rows, t), 0) // h

    def edges_of(j):
        # block range [lb, hb) this row's live (windowed) region needs;
        # lb == 0 without a window (the prefix ladder case)
        valid = valid_ref[pid * rows + j]
        vmax = valid + (mq - 1)
        hb = (vmax + blk - 1) // blk
        if window is None:
            return jnp.int32(0), hb
        lb = jnp.maximum(valid - window, 0) // blk   # row 0's edge
        return lb, hb

    # span ladder: exactly one S == hb - lb branch fires per row/phase
    # (valid >= 1 by contract), so every DMA start has exactly one
    # matching wait on its semaphore.  Without a window S spans
    # [1, nblk]; with one, S <= ceil((window + mq - 1)/blk) + 2 (the
    # lower edge floors to a block boundary, the horizon ceils).
    if window is None:
        smax_span = nblk
    else:
        smax_span = min(nblk, -(-(window + mq - 1) // blk) + 2)

    def span_ladder(j, fn):
        lb, hb = edges_of(j)
        span = hb - lb
        for S in range(1, smax_span + 1):
            @pl.when(span == S)
            def _(S=S):
                fn(S, lb)

    def kcp(j, S, lb):
        n = S * blk
        return pltpu.make_async_copy(
            k_ref.at[pid * rows + j, pl.ds(lb * blk, n), :],
            kbuf.at[j, pl.ds(0, n), :], ksem.at[j])

    def vcp(j, S, lb):
        n = S * blk
        return pltpu.make_async_copy(
            v_ref.at[pid * rows + j, pl.ds(lb * blk, n), :],
            vbuf.at[j, pl.ds(0, n), :], vsem.at[j])

    for j in range(rows):                            # all copies in
        span_ladder(j, lambda S, lb, j=j: kcp(j, S, lb).start())
        span_ladder(j, lambda S, lb, j=j: vcp(j, S, lb).start())

    def chunks(n):                                   # [(start, width)]
        return [(c0, min(_DEC_SUB, n - c0))
                for c0 in range(0, n, _DEC_SUB)]

    for j in range(rows):
        valid = valid_ref[pid * rows + j]
        a8 = pltpu.bitcast(q_ref[j] ^ jnp.uint8(0x80), s8)
        aqf = a8.astype(f32) + f32(c_q)
        aq_masked = jnp.where(seg == rowkv,
                              jnp.broadcast_to(aqf, (r_rows, c)), 0.0)
        aq_wide = aq_masked.astype(bf16)
        rowsum_aq = jnp.sum(aq_masked, axis=1,
                            keepdims=True).astype(i32)

        def k_phase(S, lb, j=j, aq_wide=aq_wide, rowsum_aq=rowsum_aq):
            kcp(j, S, lb).wait()
            for c0, cw in chunks(S * blk):
                kf = pltpu.bitcast(
                    kbuf[j, pl.ds(c0, cw), :] ^ jnp.uint8(0x80),
                    s8).astype(bf16)                 # [cw, C] k - 128
                scores = dot_t(aq_wide, kf)          # [R, cw] exact
                acc = scores + c_k * rowsum_aq
                codes = jnp.clip(
                    acc.astype(f32) * fp_ref[_MULT_S] + fp_ref[_ZP_S],
                    0.0, 255.0)
                codes = jnp.floor(codes + rb)
                s_scr[:, c0:c0 + cw] = \
                    (codes - fp_ref[_ZP_S]) * fp_ref[_S_S]

        span_ladder(j, k_phase)
        # dead score regions stay garbage — the softmax mask covers them

        # the whole post-K tail (softmax -> probability requant -> P@V
        # dots -> extraction -> output) runs under ONE live-prefix
        # ladder branch, so every VPU pass is L*blk wide instead of
        # T wide.  Measured (2026-08-20): standalone wins at high valid
        # (gpt2 v=512 17.8 -> 12.9 us/call, mq=2 11.5 -> 7.2) and
        # T=2048 long-context; IN-MODEL the step is neutral (llama
        # 0.148-0.157 vs 0.151-0.163, gpt2 0.377-0.379 vs 0.369-0.375
        # — inside the chip-hour noise band), so this is kept for the
        # high-valid serving regime, not a step-time claim.  pz stays a
        # value (an earlier revision rewrote the score scratch in place
        # and stored rowsums through a side scratch; Mosaic's lowering
        # crashed on the aliased window — 'limits[i] <= dim(i)'), and
        # the mask iotas are built PER BRANCH at [R, n] (slicing
        # pre-built [R, T] iotas also crashed the lowering).
        # Exactness: the live-only rowsum equals the full-T sum exactly
        # (dead pz contributed exact zeros; integer values, f32-exact).
        def tail_phase(S, lb, j=j, valid=valid):
            n = S * blk
            # buffer-relative iotas + the dynamic block base give
            # absolute cache positions for the masks
            abs_col = (lax.broadcasted_iota(i32, (r_rows, n), 1)
                       + lb * blk)
            rowj_n = lax.broadcasted_iota(i32, (r_rows, n), 0) // h
            keep = abs_col < valid + rowj_n
            if window is not None:
                keep = keep & (abs_col >= valid + rowj_n - window)
            sv = s_scr[:, :n]
            if softcap is not None:
                cc = f32(softcap)
                sv = cc * jnp.tanh(sv / cc)
            x = jnp.where(keep, sv, -jnp.inf)
            mx = jnp.max(x, axis=1, keepdims=True)
            e = jnp.exp(x - mx)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            pcodes = jnp.clip(p / fp_ref[_S_P] + fp_ref[_ZP_P],
                              0.0, 255.0)
            pcodes = jnp.floor(pcodes + rb)
            pz = pcodes + f32(c_p - 128)             # p - zp_p
            vcp(j, S, lb).wait()
            a2 = jnp.zeros((r_rows, c), i32)
            for c0, cw in chunks(n):
                vf = pltpu.bitcast(
                    vbuf[j, pl.ds(c0, cw), :] ^ jnp.uint8(0x80),
                    s8).astype(bf16)                 # [cw, C] v - 128
                pzb = pz[:, c0:c0 + cw].astype(bf16)
                a2 = a2 + dot_n(pzb, vf)             # [R, C] i32 partials
            rowsum_pz = jnp.sum(pz, axis=1, keepdims=True).astype(i32)
            corr = jnp.broadcast_to(c_v * rowsum_pz, (r_rows, c))
            base = jnp.where(seg == rowkv, a2 + corr, 0)
            outr = [jnp.sum(jnp.where(rowg == g, base, 0), axis=0,
                            keepdims=True)
                    for g in range(slots)]           # slots x [1, C]
            acc2f = (outr[0] if slots == 1
                     else jnp.concatenate(outr, axis=0))
            qo = jnp.clip(acc2f.astype(f32) * fp_ref[_MULT_O]
                          + fp_ref[_ZP_C], 0.0, 255.0)
            qo = (qo + rb).astype(i32)
            o_ref[j] = pltpu.bitcast((qo - 128).astype(s8), jnp.uint8) \
                ^ jnp.uint8(0x80)                    # [slots, C]

        span_ladder(j, tail_phase)


@functools.partial(jax.jit, static_argnames=("n_heads", "n_kv", "mq",
                                             "merged", "rows", "window",
                                             "softcap", "interpret"))
def _decode_attn_flat_impl(qg, k3, v3, valid, fparams, iparams, *,
                           n_heads: int, n_kv: int, mq: int = 1,
                           merged: bool = True, rows: int = 1,
                           window: int | None = None,
                           softcap: float | None = None,
                           interpret: bool = False):
    bsz, t, c = k3.shape                             # c = n_kv * d
    d = c // n_kv
    grp = n_heads // n_kv
    slots = mq * grp
    blk = _dec_blk(t)
    if not merged:
        rows = 1
    if merged:
        body = functools.partial(_decode_attn_kernel_flat_merged,
                                 rows=rows)
    else:
        body = _decode_attn_kernel_flat
    capkw = {} if softcap is None else {"softcap": float(softcap)}
    if merged and window is not None:
        kernel = functools.partial(body, n_heads=n_heads, n_kv=n_kv,
                                   t=t, d=d, blk=blk, mq=mq,
                                   window=int(window), **capkw)
        # windowed buffers/scores only ever hold the span
        buf_t = min(t, (-(-(int(window) + mq - 1) // blk) + 2) * blk)
    else:
        kernel = functools.partial(body, n_heads=n_heads,
                                   n_kv=n_kv, t=t, d=d, blk=blk, mq=mq,
                                   **capkw)
        buf_t = t
    # [B, R, C] with block (1, R, C): the block's last two dims must be
    # (8, 128)-divisible or equal the array dims — (R, C) equals.
    # Single-position MHA passes the projection row (R_in = 1, diagonal
    # built in-kernel); GQA and multi-position extends pass the
    # wrapper-placed wide query (R_in = mq * n_heads).
    qr = qg.shape[1]
    q_spec = pl.BlockSpec((rows, qr, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rows, slots, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(bsz // rows,),
        in_specs=[smem, smem, smem, q_spec,
                  pl.BlockSpec(memory_space=pltpu.ANY),   # k cache (HBM)
                  pl.BlockSpec(memory_space=pltpu.ANY)],  # v cache (HBM)
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, slots, c), jnp.uint8),
        scratch_shapes=(
            [
                pltpu.VMEM((rows, buf_t, c), jnp.uint8),  # k live bufs
                pltpu.VMEM((rows, buf_t, c), jnp.uint8),  # v live bufs
                pltpu.VMEM((mq * n_heads, buf_t), jnp.float32),  # scores
                pltpu.SemaphoreType.DMA((rows,)),    # per-row k sems
                pltpu.SemaphoreType.DMA((rows,)),    # per-row v sems
            ] if merged else [
                pltpu.VMEM((blk, c), jnp.uint8),     # k tile buffer 0
                pltpu.VMEM((blk, c), jnp.uint8),     # k tile buffer 1
                pltpu.VMEM((blk, c), jnp.uint8),     # v tile buffer 0
                pltpu.VMEM((blk, c), jnp.uint8),     # v tile buffer 1
                pltpu.VMEM((mq * n_heads, t), jnp.float32),  # scores
                pltpu.VMEM((mq * n_heads, c), jnp.int32),    # P@V accum
                pltpu.SemaphoreType.DMA,             # k sem 0
                pltpu.SemaphoreType.DMA,             # k sem 1
                pltpu.SemaphoreType.DMA,             # v sem 0
                pltpu.SemaphoreType.DMA,             # v sem 1
            ]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * mq * n_heads * t * d * 2,
            bytes_accessed=2 * bsz * t * c + 2 * bsz * (mq + 1) * c,
            transcendentals=bsz * mq * n_heads * t,
        ),
        interpret=interpret,
    )(valid, fparams, iparams, qg, k3, v3)


# Kernel revision the 'pallas' backend runs (module-level so A/B tools
# can flip it process-wide).  True = the merged-dot kernel — on-chip
# bit-exact at every geometry tried (MHA/GQA/mq, T to 2048) and faster
# at every measured shape (tools/decode_kernel_v4.py, 2026-08-20:
# walk 15-30 us/call -> merged 6-18 at B=8; T=2048 v=1900 96.7 -> 47.2).
_MERGED_DEFAULT = True


def decode_attention_flat(q2_u8, k3_u8, v3_u8, valid, *, n_heads: int,
                          n_kv_heads: int | None = None,
                          backend: str = "auto", merged: bool | None = None,
                          window: int | None = None,
                          softcap: float | None = None,
                          alibi=None,
                          interpret: bool = False, **kw):
    """Cached-decode attention on the T-major FLAT cache layout.

    q [B, H*D] u8 (pre-head-split projection row), k/v caches
    [B, T, Hkv*D] u8 (row t = that position's head-merged codes),
    ``valid`` the live length (scalar or [B], each >= 1 — attention over
    zero positions is softmax over an empty set, undefined on every
    backend) -> u8 [B, H*D] (head-merged context row).

    ``n_kv_heads`` < ``n_heads`` is grouped-query attention (llama
    family): query head h reads kv head h // (H / Hkv) — the cache stays
    kv-compact and is NEVER expanded, on either backend.  The XLA path
    batches each kv group's G query heads as the matmul M dim
    ([B, Hkv, G, T] scores); the Pallas kernel runs all H query rows
    kv-major against the kv-compact cache (the coarser segment mask —
    see the kernel comment), with the wide block-diagonal query operand
    pre-placed here (dead segments = code 128 -> recenter to 0) and the
    [grp, C] kernel output restored to head-major order after the call.

    The serving layout: appends are contiguous row writes, and the Pallas
    kernel DMAs + computes only live _DEC_BLK blocks (cost ~ valid, not
    max_len).  Exact for any T (see the kernel comment).
    """
    bsz, t, c = k3_u8.shape
    if alibi is not None:
        # ALiBi (BLOOM/MPT): a per-head linear score bias — only the
        # composed XLA lowering carries it (the Pallas kernel has no
        # per-head bias tail); exactness is untouched since the bias is
        # a static function of absolute positions
        if backend == "pallas":
            raise ValueError(
                "decode_attention_flat: alibi has no Pallas lowering; "
                "use backend='auto'/'xla'")
        backend = "xla"
        if len(alibi) != n_heads:
            raise ValueError(
                f"alibi slopes ({len(alibi)}) != query heads "
                f"{n_heads} — under head-local TP pass the LOCAL "
                "shard's slopes (alibi models disable head-local TP)")
    if merged is None:
        merged = _MERGED_DEFAULT
    if window is not None and not merged:
        # the span ladder lives in the merged kernel only; the walk
        # oracle has no windowed form — compose instead
        backend = "xla"
    n_kv = n_heads if n_kv_heads is None else n_kv_heads
    if n_heads % n_kv:
        raise ValueError(f"{n_heads} query heads not divisible by "
                         f"{n_kv} kv heads")
    if c % n_kv:
        raise ValueError(f"flat kv channels {c} not divisible by "
                         f"{n_kv} kv heads")
    d = c // n_kv
    grp = n_heads // n_kv
    # q [B, H*D]: one query position (the decode step); q [B, m, H*D]:
    # m consecutive positions (speculative verify / chunked extend) —
    # ``valid`` is then the FIRST position's live length and row j sees
    # valid + j columns (the causal extend mask).
    multi = q2_u8.ndim == 3
    mq = q2_u8.shape[1] if multi else 1
    if q2_u8.shape[-1] != n_heads * d:
        raise ValueError(
            f"query width {q2_u8.shape[-1]} != n_heads*head_dim "
            f"{n_heads}*{d}")
    v_arr = jnp.asarray(valid, jnp.int32)
    if backend == "auto":
        # MHA and GQA both run the kernel.  interpret counts as a kernel
        # target so interpret-mode 'auto' tests the kernel.  Large-mq
        # extends (chunked prefill through _extend_step) blow the
        # kernel's scores scratch (mq*H*T f32 — 12.6 MB at mq=128,
        # H=12, T=2048: measured scoped-VMEM OOM at 25.5M/16M); the
        # composed path is the prefill-style compute anyway there.
        on_kernel_target = jax.default_backend() == "tpu" or interpret
        scores_vmem = mq * n_heads * t * 4
        backend = ("pallas" if on_kernel_target
                   and kernel_eligible(t, c)
                   and scores_vmem <= (4 << 20) else "xla")
    elif backend == "pallas":
        if not _dec_blk(t):
            raise ValueError(
                f"decode_attention_flat kernel needs a cache length "
                f"divisible by 32, got T={t}; use 'auto'/'xla'")
    if backend != "pallas":
        def to4(x2):                               # [B,T,Hkv*D]->[B,Hkv,T,D]
            return jnp.transpose(x2.reshape(bsz, -1, n_kv, d),
                                 (0, 2, 1, 3))
        # GQA: kv group kv's G query heads ride the matmul M dim; query
        # head h = kv*grp + g lands at row (kv, g), matching the flat
        # head-major q layout.  Multi-position extends stack the m
        # positions into the same M dim (rows (kv, j, g)) with a
        # PER-ROW valid mask (valid + j).
        q4 = jnp.transpose(
            q2_u8.reshape(bsz, mq, n_kv, grp, d), (0, 2, 1, 3, 4)
        ).reshape(bsz, n_kv, mq * grp, d) if multi else \
            q2_u8.reshape(bsz, n_kv, grp, d)
        vmask = (v_arr.reshape(bsz, 1, 1, 1) if v_arr.ndim else v_arr)
        if multi:
            rowj = (jnp.arange(mq * grp, dtype=jnp.int32)
                    // grp).reshape(1, 1, mq * grp, 1)
            vmask = vmask + rowj
        al4 = None
        if alibi is not None:
            # q4 rows are (kv, g) [or (kv, j, g) on extends] with query
            # head h = kv*grp + g: arrange the slope ladder to match
            sl = jnp.asarray(alibi, jnp.float32).reshape(n_kv, grp)
            al4 = (jnp.tile(sl[:, None, :], (1, mq, 1))
                   .reshape(n_kv, mq * grp) if multi else sl)
        out4 = decode_attention_xla(q4, to4(k3_u8), to4(v3_u8), vmask,
                                    window=window, softcap=softcap,
                                    alibi=al4, **kw)
        if multi:
            # [B, Hkv, m*grp, D] rows (kv, j, g) -> [B, m, H*D]
            return jnp.transpose(
                out4.reshape(bsz, n_kv, mq, grp, d), (0, 2, 1, 3, 4)
            ).reshape(bsz, mq, n_heads * d)
        return out4.reshape(bsz, n_heads * d)
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
    if grp == 1 and not multi:
        qg = q2_u8.reshape(bsz, 1, c)            # diagonal built in-kernel
    else:
        # kv-major query rows (row j*H + g*n_kv + kv = position j, query
        # head kv*grp + g), each placed in its kv segment with code 128
        # (-> 0 after recentering) elsewhere — the wide block-diagonal
        # operand the kernel's (seg == r % n_kv) mask expects.  Tiny:
        # [B, m*H, C] u8, fused by XLA into the surrounding glue.
        q3 = q2_u8.reshape(bsz, mq, n_heads * d)
        qkvm = jnp.transpose(
            q3.reshape(bsz, mq, n_kv, grp, d), (0, 1, 3, 2, 4)
        ).reshape(bsz, mq * n_heads, d)
        colkv = jnp.arange(c, dtype=jnp.int32) // d
        rowkv = jnp.arange(mq * n_heads, dtype=jnp.int32) % n_kv
        qg = jnp.where(colkv[None, None, :] == rowkv[None, :, None],
                       jnp.tile(qkvm, (1, 1, n_kv)), jnp.uint8(128))
    out3 = _decode_attn_flat_impl(qg, k3_u8, v3_u8, valid_b,
                                  fparams, iparams, n_heads=n_heads,
                                  n_kv=n_kv, mq=mq, merged=merged,
                                  rows=_pick_rows(bsz, t, c),
                                  window=(None if window is None
                                          else int(window)),
                                  softcap=(None if softcap is None
                                           else float(softcap)),
                                  interpret=interpret)
    if grp == 1 and not multi:
        return out3.reshape(bsz, c)
    # [B, m*grp, C] slot rows (j, g), kv-major segments -> head-major
    out = jnp.transpose(out3.reshape(bsz, mq, grp, n_kv, d),
                        (0, 1, 3, 2, 4)).reshape(bsz, mq, n_heads * d)
    return out if multi else out.reshape(bsz, n_heads * d)


def decode_attention_xla(q_u8, k_u8, v_u8, valid, *, scale_q, zp_q,
                         scale_k, zp_k, scale_v, zp_v, scale_s, zp_s,
                         scale_p, zp_p, scale_c, zp_c, alpha: float,
                         rounding: str = "trunc",
                         window: int | None = None,
                         softcap: float | None = None,
                         alibi=None):
    """Composed decode attention (the oracle): literally QuantMatmul ->
    QuantSoftmax(valid_len) -> QuantMatmul on [B, H, 1, T] scores.

    ``valid`` broadcasts against the score columns: a scalar (generate's
    single position) or [B, 1, 1, 1] (per-slot serving positions).
    ``window`` (mistral-family sliding-window attention): each query
    additionally ignores columns below ``valid - window`` — masked
    positions quantize to exactly zp_p, the same exact-zero story as
    the upper bound.
    """
    s = qmatmul_act(q_u8, k_u8, scale_a=scale_q, zp_a=zp_q,
                    scale_b=scale_k, zp_b=zp_k, scale_c=scale_s, zp_c=zp_s,
                    alpha=alpha, transpose_b=True, rounding=rounding)
    f = quant_ops.dequantize_u8(s, scale_s, zp_s)
    if softcap is not None:
        cc = jnp.float32(softcap)
        f = cc * jnp.tanh(f / cc)
    tq, tk = f.shape[-2], f.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    if alibi is not None:
        # ``alibi`` [n_kv, rows]: slope of each score row's query head;
        # the query's absolute position is valid - 1, so the bias is
        # slope * (col - (valid-1)) — 0 at self, negative into the
        # past; future columns are masked to -inf below anyway
        a = jnp.asarray(alibi, jnp.float32)
        a = a.reshape(1, a.shape[0], a.shape[1], 1)
        f = f + a * (col - (valid - 1)).astype(jnp.float32)
    keep = col < valid
    if window is not None:
        keep = keep & (col >= valid - int(window))
    f = jnp.where(keep, f, -jnp.inf)
    p = quant_ops.quantize_u8(jax.nn.softmax(f, axis=-1), scale_p, zp_p,
                              rounding)
    return qmatmul_act(p, v_u8, scale_a=scale_p, zp_a=zp_p,
                       scale_b=scale_v, zp_b=zp_v, scale_c=scale_c,
                       zp_c=zp_c, rounding=rounding)


def decode_attention(q_u8, k_u8, v_u8, valid, *, backend: str = "auto",
                     interpret: bool = False, **kw):
    """Cached-decode attention on [B, H, T, D] operands (compat API).

    q [B, H, 1, D] u8, k/v [B, H, T, D] u8 caches, ``valid`` the live
    length (scalar, [B], or [B,1,1,1]) -> u8 [B, H, 1, D].

    A transpose wrapper over :func:`decode_attention_flat` — the T-major
    flat layout is the native serving path (the model stores caches that
    way); this API keeps the head-split layout for composability and
    op-level tests.  Exact for any cache length.

    Known tie caveat: the integer accumulators are exact, but the final
    requant ``acc*mult + zp`` is f32, and whether the compiler emits it
    as mul+add or a fused FMA differs between backends.  When the true
    value lands EXACTLY on a rounding boundary (x.5 under 'nearest', an
    integer under 'trunc'), kernel and composed can differ by one output
    code (observed: ~1 element in 512 in CPU interpret mode; on-TPU
    trunc runs have always matched).  This is a property of the composed
    path's own float epilogue, not of the kernel.
    """
    bsz, n_heads, one, d = q_u8.shape
    if one != 1:
        raise ValueError(f"decode_attention expects one query row, got "
                         f"{q_u8.shape}")
    v_arr = jnp.asarray(valid, jnp.int32)
    if backend != "pallas" and (backend != "auto"
                                or jax.default_backend() != "tpu"
                                and not interpret):
        return decode_attention_xla(
            q_u8, k_u8, v_u8,
            v_arr.reshape(bsz, 1, 1, 1) if v_arr.ndim else v_arr, **kw)

    def flat(x4):                                    # [B,H,T,D]->[B,T,H*D]
        return jnp.transpose(x4, (0, 2, 1, 3)).reshape(
            x4.shape[0], x4.shape[2], -1)

    out2 = decode_attention_flat(
        flat(q_u8).reshape(bsz, n_heads * d), flat(k_u8), flat(v_u8),
        v_arr, n_heads=n_heads, backend=backend, interpret=interpret,
        **kw)
    return jnp.transpose(out2.reshape(bsz, 1, n_heads, d), (0, 2, 1, 3))
