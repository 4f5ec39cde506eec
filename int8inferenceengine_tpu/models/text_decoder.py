"""TextDecoder: INT8 autoregressive (GPT-style) decoder with a u8 KV cache.

The reference engine is a feed-forward CNN inference engine (SURVEY.md §2.3)
— this extends the framework to the other modern serving workload:
causal-attention decoding.  Everything reuses the INT8 transformer
primitives (QuantEmbed / QuantPosEmbed(cls=False) / QuantMatmul /
QuantSoftmax(causal=True) / QuantLayerNorm / fused Linear+gelu), plus two
decode-path capabilities:

* **u8 KV cache, T-major flat layout**: each layer's wk/wv Linear emits
  u8 codes at a FIXED calibrated (scale, zp) after convert(), so cached
  keys/values are plain u8 code arrays — 4x smaller than an f32 cache —
  stored as static [B, T_max, H*D] buffers: position t's codes are ONE
  contiguous row, so the per-step append is a contiguous
  ``lax.dynamic_update_slice`` row write and the decode-attention kernel
  (ops/attention.py flat path) DMAs only live row blocks (cost scales
  with the live length, not T_max).  Static shapes: one compiled decode
  step serves every position.
* **exact masked attention over the static cache**: scores span all T_max
  cached positions; ``QuantSoftmax(valid_len=pos+1)`` masks dead columns
  to -inf, whose probabilities then quantize to exactly the zero_point
  code — and (p - zp_p) = 0 contributes exactly zero through
  ops/qmatmul.py's integer zero-point math, so garbage in unwritten cache
  rows can never leak into the output.  Cached decode is therefore
  BIT-IDENTICAL to re-running the full causal forward each step
  (pinned by tests/test_text_decoder.py).

``generate()`` runs greedy decoding as ONE jitted program: prefill fills
the cache for the whole prompt in a single causal forward, then a
``lax.scan`` carries (cache, position, token) through the decode steps —
TPU-idiomatic (no per-token dispatch, no dynamic shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import DEFAULT_CONFIG, QuantConfig
from ..layers import (Linear, QuantAct, QuantAdd, QuantEmbed, QuantLayerNorm,
                      QuantMatmul, QuantPosEmbed, QuantSoftmax,
                      fused_decode_attention, fused_extend_attention,
                      fused_linear_act, fused_qkv)
from ..module import Module
from ..ops import functional as F
from ..tensor import Tensor

__all__ = ["TextDecoder", "torch_text_decoder", "nucleus_code_floor",
           "nucleus_float_cutoff", "topk_code_floor", "code_histogram"]


def code_histogram(codes):
    """Per-row 256-bin count histogram of u8 codes [B, V] -> f32
    [B, 256] (exact for V < 2^24).  The one O(B*V) scatter both code
    floors share — compute it once when top_k AND top_p are active
    (round-5 review finding: the combined filter paid it twice)."""
    return jax.vmap(
        lambda c: jnp.zeros(256, jnp.float32).at[c].add(1.0))(codes)


def nucleus_code_floor(codes, s_over_t, p, keep=None, hist=None):
    """Smallest u8 logit code inside the nucleus (top-p) set, per row.

    ``codes`` [B, V] u8 logit codes, ``s_over_t`` [B] = head scale /
    temperature, ``p`` [B] in (0, 1].  Returns u8 [B]: mask tokens with
    ``code < floor`` to -inf, then sample.

    ``keep`` (optional bool [B, V]): restrict the nucleus mass to the
    kept tokens — the top_k+top_p composition uses the SEQUENTIAL (HF)
    semantics, nucleus measured over the already-top_k-filtered
    distribution, matching ``nucleus_float_cutoff`` applied to masked
    logits (round-4 advisor finding: the two paths used to differ).
    Excluded tokens simply don't enter the histogram, so they carry
    zero mass.

    TPU-native nucleus: on the 8-bit logit grid every token with the
    same code has the SAME probability, so the descending-probability
    order groups into at most 256 code classes and nucleus selection is
    a CODE THRESHOLD — like the documented top_k-as-threshold, ties at
    the boundary keep the whole class.  Build the per-row 256-bin code
    histogram (one scatter-add, O(V)), weight class v by its
    unnormalized softmax mass ``n_v * exp((v - 255) * s/T)`` (the
    (zp, 255) shift is a constant factor that cancels against the
    total), reverse-cumulative-sum (O(256)), and the floor is the
    largest v whose suffix mass still reaches ``p * total``.  No
    vocab-length sort — the [B, V]-sized work is one scatter and one
    compare, so (unlike a static top_k) the threshold is fully dynamic
    and can differ per row in one compiled program (the serving
    engine's per-slot top_p rides this).

    f32 note: classes more than ~88/(s/T) codes below the max underflow
    ``exp`` to exactly 0 mass and are excluded even at p = 1.0 — their
    true probability is < 1e-38, unreachable by f32 categorical anyway.
    """
    if hist is None:
        if keep is None:
            hist = code_histogram(codes)
        else:
            hist = jax.vmap(
                lambda c, w: jnp.zeros(256, jnp.float32).at[c].add(w))(
                    codes, keep.astype(jnp.float32))
    # else: the caller passes a (possibly class-masked) count histogram
    v = jnp.arange(256, dtype=jnp.float32)
    w = hist * jnp.exp((v[None, :] - 255.0) * s_over_t[:, None])
    revcum = jnp.cumsum(w[:, ::-1], -1)[:, ::-1]   # [B,256]: sum_{u>=v}
    ok = revcum >= p[:, None] * revcum[:, :1]
    return jnp.max(jnp.where(ok, jnp.arange(256), 0), -1).astype(jnp.uint8)


def topk_code_floor(codes, k, hist=None):
    """Smallest u8 logit code inside the top-k set, per row — the
    DYNAMIC form of top_k: ``codes`` [B, V] u8, ``k`` [B] int32 ->
    u8 [B]; keep tokens with ``code >= floor``.

    On the 8-bit grid the k-th largest VALUE is a code class, so the
    static path's threshold (``lax.top_k(codes, k)[0][:, -1]``) equals
    the largest code v whose suffix COUNT reaches k — computable from
    the same 256-bin histogram as :func:`nucleus_code_floor` with a
    count reverse-cumsum instead of a mass one.  Exactly the static
    semantics (ties at the k-th value keep the whole class), but ``k``
    is a TRACED per-row vector: the serving engine serves per-request
    top_k inside ONE compiled chunk program, which a static
    ``lax.top_k`` cannot (its k is a trace constant).

    Edge cases: k >= V keeps everything (no suffix reaches k -> floor
    0); k <= 0 is the caller's "off" gate (the floor degenerates to
    255 — gate before use)."""
    if hist is None:
        hist = code_histogram(codes)
    revcum = jnp.cumsum(hist[:, ::-1], -1)[:, ::-1]   # [B,256] counts >= v
    ok = revcum >= k[:, None].astype(jnp.float32)
    return jnp.max(jnp.where(ok, jnp.arange(256), 0), -1).astype(jnp.uint8)


def nucleus_float_cutoff(logits_t, p):
    """Per-row minimum kept logit for nucleus sampling on FLOAT logits
    (the weight_only serving path has no code grid): sort descending,
    softmax, keep the smallest prefix whose cumulative mass reaches
    ``p`` (a position stays iff the mass strictly BEFORE it is < p, so
    ties at the cutoff keep every tied logit).  ``logits_t`` [B, V]
    already divided by temperature; ``p`` [B].  Returns [B, 1]."""
    srt = -jnp.sort(-logits_t, -1)
    probs = jax.nn.softmax(srt, -1)
    before = jnp.cumsum(probs, -1) - probs
    return jnp.min(jnp.where(before < p[:, None], srt, jnp.inf), -1,
                   keepdims=True)


class TextDecoder(Module):
    """Causal transformer LM (gpt_tiny defaults: 128 dim / 2 blocks).

    Per block i: ``ln1_{i}`` -> ``wq{i}``/``wk{i}``/``wv{i}`` -> heads ->
    ``attn{i}`` (QK^T) -> ``smax{i}`` (causal) -> ``av{i}`` -> ``proj{i}``
    -> ``add1_{i}``; then ``ln2_{i}`` -> ``fc1_{i}`` -> ``gelu{i}`` ->
    ``fc2_{i}`` -> ``add2_{i}``.  Head: ``ln_f`` -> ``head`` over every
    position (LM logits [B, T, vocab]).
    """

    def __init__(self, vocab_size: int = 1000, max_len: int = 64,
                 dim: int = 128, depth: int = 2, heads: int = 2,
                 mlp_ratio: int = 4, mlp_hidden: int | None = None,
                 act: str = "gelu",
                 config: QuantConfig = DEFAULT_CONFIG):
        """``act`` selects the MLP activation ('gelu' default; 'relu'
        is the OPT family) and ``mlp_hidden`` overrides ``mlp_ratio``
        when a checkpoint's ffn width is not a clean multiple (the
        layer attribute stays ``gelu{i}`` for machinery compatibility
        regardless of the chosen fn)."""
        super().__init__(config)
        if dim % heads:
            raise ValueError(f"dim {dim} not divisible by heads {heads}")
        self.vocab_size, self.max_len = vocab_size, max_len
        self.dim, self.depth, self.heads = dim, depth, heads
        mlp_hidden = (mlp_ratio * dim if mlp_hidden is None
                      else int(mlp_hidden))
        self.mlp_hidden = mlp_hidden
        self.act = str(act)
        # kv_heads / head_dim generalize the cache geometry (GQA models
        # — models/llama.py — store kv-compact caches); here MHA
        self.kv_heads = heads
        self.head_dim = dim // heads
        self.INPUT_SHAPE = (max_len,)           # token-id sequence
        self.embed = QuantEmbed(vocab_size, dim, config=config)
        self.pe = QuantPosEmbed(max_len, dim, config=config, cls=False)
        for i in range(1, depth + 1):
            setattr(self, f"ln1_{i}", QuantLayerNorm(dim, config=config))
            for w in ("wq", "wk", "wv"):
                setattr(self, f"{w}{i}", Linear(dim, dim, config=config))
            setattr(self, f"attn{i}", QuantMatmul(
                alpha=(dim // heads) ** -0.5, transpose_b=True,
                config=config))
            setattr(self, f"smax{i}", QuantSoftmax(config=config,
                                                   causal=True))
            setattr(self, f"av{i}", QuantMatmul(config=config))
            setattr(self, f"proj{i}", Linear(dim, dim, config=config))
            setattr(self, f"add1_{i}", QuantAdd(config=config))
            setattr(self, f"ln2_{i}", QuantLayerNorm(dim, config=config))
            setattr(self, f"fc1_{i}", Linear(dim, mlp_hidden,
                                             config=config))
            setattr(self, f"gelu{i}", QuantAct(act, config=config))
            setattr(self, f"fc2_{i}", Linear(mlp_hidden, dim,
                                             config=config))
            setattr(self, f"add2_{i}", QuantAdd(config=config))
        self.ln_f = QuantLayerNorm(dim, config=config)
        self.head = Linear(dim, vocab_size, config=config)

    def tp_roles(self, model_size: int) -> dict:
        """Megatron-style transformer TP plan: QKV column-parallel with
        head-local attention (outputs stay sharded) when heads divide the
        model axis, attention out-proj and fc2 row-parallel (s32 partials
        psummed), fc1 column-parallel feeding the sharded MLP interior.
        Two collectives per block instead of a gather after every Linear.
        Covers forward(); generate()'s scan is not shard_mapped (yet)."""
        roles = {}
        head_local = self.heads % model_size == 0
        for i in range(1, self.depth + 1):
            if head_local:
                for w in ("wq", "wk", "wv"):
                    roles[f"{w}{i}"] = "col_local"
            roles[f"proj{i}"] = "row"
            roles[f"fc1_{i}"] = "col_local"
            roles[f"fc2_{i}"] = "row"
        return roles

    # -- shared block body ---------------------------------------------------
    def _stem(self, ids: Tensor, start=None) -> Tensor:
        """Token embedding + position scheme -> [B, T, C].  ``start`` is
        None for the full/prefill forward (positions 0..T), or the decode
        position (traced scalar / per-slot [B] vector).  Rotary models
        (models/llama.py) override: no additive table — positions enter
        inside the blocks."""
        x = self.embed(ids)
        return self.pe(x) if start is None else self.pe(x, start=start)

    def _block(self, i, x, b, t, capture=None, start=0):
        """One decoder block on the flat [b*t, C] view (causal softmax).

        ``capture``: dict collecting this block's fresh k/v head codes
        (the prefill path stashes them into the KV cache).
        """
        c = self.dim
        h = getattr(self, f"ln1_{i}")(x)
        q2, k2, v2 = self._qkv(i, h)
        # -1 widths: under head-parallel TP the projections keep their
        # LOCAL channel shard (c / model_size) instead of gathering
        qh = F.split_heads(q2.reshape(b, t, -1), self.heads)
        kh = F.split_heads(k2.reshape(b, t, -1), self.heads)
        vh = F.split_heads(v2.reshape(b, t, -1), self.heads)
        if capture is not None:
            # FLAT rows for the T-major KV cache (ops/attention.py flat
            # decode path): position t's codes are one contiguous [H*D] row
            capture[i] = (k2.reshape(b, t, -1), v2.reshape(b, t, -1))
        s = getattr(self, f"attn{i}")(qh, kh)
        p = getattr(self, f"smax{i}")(s)
        o = getattr(self, f"av{i}")(p, vh)
        o = F.merge_heads(o)
        o = o.reshape(b * t, o.shape[-1])
        o = getattr(self, f"proj{i}")(o)
        x = getattr(self, f"add1_{i}")(x, o)
        return self._mlp(i, x)

    def _mlp(self, i, x):
        """The block's MLP tail (ln2 -> fc1/gelu [fused] -> fc2 -> add2)
        — ONE implementation shared by the prefill block, the decode
        step, and the multi-token extend (LlamaDecoder overrides with
        its SwiGLU, MoEDecoder with its expert MLP)."""
        h = getattr(self, f"ln2_{i}")(x)
        fc1, gelu = getattr(self, f"fc1_{i}"), getattr(self, f"gelu{i}")
        if fc1.is_quantized and self.config.fuse_linear_act:
            h = fused_linear_act(fc1, gelu, h)
        else:
            h = gelu(fc1(h))
        h = getattr(self, f"fc2_{i}")(h)
        return getattr(self, f"add2_{i}")(x, h)

    def forward(self, ids):
        x = self._stem(ids)                      # [B, T, C]
        b, t, c = x.shape
        x = x.reshape(b * t, c)
        for i in range(1, self.depth + 1):
            x = self._block(i, x, b, t)
        x = self.ln_f(x)
        return self.head(x).reshape(b, t, self.vocab_size)

    # -- KV-cache decoding ----------------------------------------------------
    def _kv_scales(self, i):
        wk, wv = getattr(self, f"wk{i}"), getattr(self, f"wv{i}")
        return (wk.scale, wk.zero_point), (wv.scale, wv.zero_point)

    # -- ring KV cache (sliding-window layers) -------------------------------
    def _layer_window(self, i):
        """Layer i's sliding window (None = global attention)."""
        return getattr(getattr(self, f"smax{i}"), "window", None)

    def _cache_rows(self, i) -> int:
        """Allocated KV-cache rows for layer i.

        With ``ring_cache=True`` (llama/gemma families) a windowed
        layer's cache holds only R = roundup32(2W) rows instead of
        max_len — windowed attention never reads past the last W
        positions, so the cache slides by COMPACTION: when the R rows
        fill, one contiguous W-row block copy moves the live window to
        the front (amortized W rows per R-W steps ~ 1 row/step; row r
        holds absolute position base + r, base closed-form in pos, and
        reads stay contiguous so the flat decode kernel and the
        composed path both run UNCHANGED — no wraparound indexing
        anywhere).  Global layers (and everything when the flag is off)
        keep max_len rows."""
        w = self._layer_window(i)
        if w is None or not getattr(self, "ring_cache", False):
            return self.max_len
        r = -(-2 * int(w) // 32) * 32
        return min(self.max_len, r)

    @staticmethod
    def _ring_base(pos, rows: int, window: int):
        """Closed-form ring base: rows [0, R) hold absolute positions
        [base, base+R); base advances by S = R - W each time pos - base
        reaches R, so pos - base stays in [W, R-1] at steady state
        (floor division toward -inf makes the max() clamp exact for
        pos < R)."""
        s = rows - window
        return s * jnp.maximum(0, 1 + (pos - rows) // s)

    def _prefill(self, ids, last=None, full_cache=False):
        """Full causal forward over the prompt; returns (last-token logit
        codes, cache) with each layer's k/v codes written at positions
        [0, T0).  ``last`` ([B] or scalar, traced): true prompt lengths
        when ids are right-padded — logits come from row last-1.
        ``full_cache=True`` forces max_len rows even on a ring_cache
        model (the serving engine's slot caches are full-length)."""
        b, t0 = ids.data.shape
        x = self._stem(ids)
        x = x.reshape(b * t0, self.dim)
        cache = {}
        for i in range(1, self.depth + 1):
            cap = {}
            x = self._block(i, x, b, t0, capture=cap, start=0)
            kf, vf = cap[i]                          # FLAT [B, T0, C] rows
            dt = kf.data.dtype
            rows_i = self.max_len if full_cache else self._cache_rows(i)
            ring_rows = None
            if t0 > rows_i:
                # ring cache: keep only the tail rows that decode's
                # steady-state base formula expects (same closed form)
                w = self._layer_window(i)
                s = rows_i - w
                if last is None:
                    # static: t0 is a trace constant
                    base0 = s * (1 + (t0 - 1 - rows_i) // s)
                else:
                    # right-padded serving prompts: each row's live
                    # window ends at ITS true length, so the tail base
                    # is per row (traced).  Zero-pad so the slice is
                    # always in-bounds; rows past a prompt's length are
                    # garbage-but-masked, exactly like the full cache.
                    base0 = 0
                    b0 = (s * jnp.maximum(
                        0, 1 + (last - 1 - rows_i) // s)).astype(
                            jnp.int32)                       # [B]

                    def ring_rows(flat, b0=b0, rows_i=rows_i):
                        padv = jnp.zeros(
                            (flat.shape[0], rows_i, flat.shape[2]),
                            flat.dtype)
                        full = jnp.concatenate([flat, padv], 1)
                        return jax.vmap(
                            lambda r, st: lax.dynamic_slice_in_dim(
                                r, st, rows_i, 0))(full, b0)
            else:
                base0 = 0
            if kf.quantized:
                # u8 codes (W8A8): T-major flat buffers [B, T_max, C] —
                # appends are contiguous row writes and the decode kernel
                # DMAs only live row blocks.  Under head-parallel TP the
                # captured rows are a LOCAL channel shard, so each device
                # stores only its heads' cache.
                c_loc = kf.data.shape[-1]
                if ring_rows is not None:
                    cache[i] = (ring_rows(kf.data), ring_rows(vf.data))
                else:
                    k_buf = jnp.zeros((b, rows_i, c_loc), dt)
                    v_buf = jnp.zeros((b, rows_i, c_loc), dt)
                    cache[i] = (
                        lax.dynamic_update_slice(
                            k_buf, kf.data[:, base0:], (0, 0, 0)),
                        lax.dynamic_update_slice(
                            v_buf, vf.data[:, base0:], (0, 0, 0)),
                    )
            else:
                # float cache (weight_only modes): the composed attention
                # consumes HEAD-SPLIT [B, H, T, D] views — keep the cache
                # in that layout so the decode step never transposes the
                # whole float cache in-scan (12 MB/layer at gpt2-small)
                if ring_rows is not None:
                    raise NotImplementedError(
                        "ring-cache serving prefill (right-padded "
                        "prompts beyond the ring rows) is u8-path "
                        "only; weight_only engines allocate "
                        "full-length caches")
                kh = F.split_heads(kf, self.kv_heads)
                vh = F.split_heads(vf, self.kv_heads)
                h_loc, hd = kh.data.shape[1], kh.data.shape[3]
                k_buf = jnp.zeros((b, h_loc, rows_i, hd), dt)
                v_buf = jnp.zeros((b, h_loc, rows_i, hd), dt)
                cache[i] = (
                    lax.dynamic_update_slice(
                        k_buf, kh.data[:, :, base0:], (0, 0, 0, 0)),
                    lax.dynamic_update_slice(
                        v_buf, vh.data[:, :, base0:], (0, 0, 0, 0)),
                )
        x = self.ln_f(x)
        # u8 logit CODES — argmax over codes == argmax over dequantized
        # logits (one positive scale), so greedy decoding never dequantizes.
        codes = self.head(x).data.reshape(b, t0, self.vocab_size)
        if last is None:
            return codes[:, -1, :], cache
        # right-padded prompt (serving buckets): the causal mask means rows
        # < last never see the pad garbage, so codes[:, last-1] is exact.
        return jnp.take_along_axis(
            codes, (last - 1).reshape(-1, 1, 1).astype(jnp.int32),
            axis=1)[:, 0, :], cache

    def _decode_step(self, cache, pos, tok):
        """One cached decode step: tok [B] int32 at position ``pos``.

        ``pos`` may be a scalar (every row at the same position — the
        single-sequence generate() path) or a [B] vector (per-slot
        positions — the continuous-batching serving path, where each slot
        is at a different point in its sequence)."""
        b = tok.shape[0]
        per_slot = getattr(pos, "ndim", 0) == 1
        x = self._stem(Tensor(tok[:, None].astype(jnp.float32)),
                       start=pos)                # [B, 1, C]
        x = x.reshape(b, self.dim)
        valid = ((pos + 1).reshape(-1, 1, 1, 1) if per_slot else pos + 1)
        new_cache = {}
        for i in range(1, self.depth + 1):
            cap = {}
            k_cache, v_cache = cache[i]
            (ks, kzp), (vs, vzp) = self._kv_scales(i)
            # ring cache (a static property of the ALLOCATED rows, so
            # the serving engine's full-size caches take the plain path
            # through this same function): shift-compact when full,
            # then everything downstream works in row coordinates
            row_ax = 2 if k_cache.ndim == 4 else 1
            rows_total = k_cache.shape[row_ax]
            if rows_total < self.max_len:
                w = self._layer_window(i)
                s = rows_total - w
                base = self._ring_base(pos, rows_total, w)
                shift = base > self._ring_base(pos - 1, rows_total, w)
                if per_slot:
                    # serving engine (round 5): each slot compacts on
                    # its OWN schedule — pos/base/shift are [B] vectors,
                    # the cond becomes a vmapped select.  Cost: the
                    # W-row copy is COMPUTED every step for every slot
                    # and masked (vs amortized ~1 row/step in the
                    # scalar path) — about one extra window-read of
                    # HBM traffic per windowed layer, the price of
                    # per-slot schedules in one SPMD program.
                    ax = row_ax - 1          # row axis inside one slot

                    def _compact1(k, do, s=s, w=w, ax=ax):
                        shifted = lax.dynamic_update_slice_in_dim(
                            k, lax.dynamic_slice_in_dim(k, s, w, ax),
                            0, ax)
                        return jnp.where(do, shifted, k)

                    k_cache = jax.vmap(_compact1)(k_cache, shift)
                    v_cache = jax.vmap(_compact1)(v_cache, shift)
                    row = pos - base             # [B] write rows
                    vi = valid - base.reshape(-1, 1, 1, 1)
                else:
                    def _compact(kv, s=s, w=w, ax=row_ax):
                        k, v = kv
                        return (lax.dynamic_update_slice_in_dim(
                                    k, lax.dynamic_slice_in_dim(k, s, w,
                                                                ax),
                                    0, ax),
                                lax.dynamic_update_slice_in_dim(
                                    v, lax.dynamic_slice_in_dim(v, s, w,
                                                                ax),
                                    0, ax))

                    k_cache, v_cache = lax.cond(
                        shift, _compact, lambda kv: kv,
                        (k_cache, v_cache))
                    row = pos - base   # write row; window rows precede
                    vi = valid - base  # live rows; masks stay relative
            else:
                row, vi = pos, valid

            def kv_hook(cap=cap, i=i, k_cache=k_cache, v_cache=v_cache,
                        ks=ks, kzp=kzp, vs=vs, vzp=vzp, pos=row):
                kf, vf = cap[i]                      # FLAT [B, 1, C] rows
                sharded = kf._tp_sharded
                if not kf.quantized:
                    # weight_only: HEAD-SPLIT float cache [B, Hkv, T, D]
                    kh, vh = (F.split_heads(kf, self.kv_heads),
                              F.split_heads(vf, self.kv_heads))
                    if per_slot:
                        upd = jax.vmap(
                            lambda c, u, p: lax.dynamic_update_slice(
                                c, u, (0, p, 0)))
                        kc = upd(k_cache, kh.data, pos)
                        vc = upd(v_cache, vh.data, pos)
                    else:
                        kc = lax.dynamic_update_slice(
                            k_cache, kh.data, (0, 0, pos, 0))
                        vc = lax.dynamic_update_slice(
                            v_cache, vh.data, (0, 0, pos, 0))
                    new_cache[i] = (kc, vc)
                    return (Tensor(kc, _tp_sharded=sharded),
                            Tensor(vc, _tp_sharded=sharded))
                if per_slot:
                    upd = jax.vmap(
                        lambda c, u, p: lax.dynamic_update_slice(
                            c, u, (p, 0)))
                    kc = upd(k_cache, kf.data, pos)
                    vc = upd(v_cache, vf.data, pos)
                else:
                    kc = lax.dynamic_update_slice(k_cache, kf.data,
                                                  (0, pos, 0))
                    vc = lax.dynamic_update_slice(v_cache, vf.data,
                                                  (0, pos, 0))
                new_cache[i] = (kc, vc)
                return (Tensor(kc, ks, kzp, _tp_sharded=sharded),
                        Tensor(vc, vs, vzp, _tp_sharded=sharded))

            x = self._block_decode(i, x, b, vi, cap, kv_hook, pos=pos)
        x = self.ln_f(x)
        return self.head(x).data, new_cache      # u8 logit codes [B, V]

    def _qkv(self, i, h):
        if self.config.fuse_qkv != "off":
            return fused_qkv(getattr(self, f"wq{i}"),
                             getattr(self, f"wk{i}"),
                             getattr(self, f"wv{i}"), h)
        return (getattr(self, f"wq{i}")(h), getattr(self, f"wk{i}")(h),
                getattr(self, f"wv{i}")(h))

    def _block_decode(self, i, x, b, valid, cap, kv_hook, pos=0):
        h = getattr(self, f"ln1_{i}")(x)
        q2, k2, v2 = self._qkv(i, h)
        # FLAT [B, 1, C] rows into the T-major cache (local channel
        # shards under head-parallel TP — the cache is head-sharded too)
        cap[i] = (k2.reshape(b, 1, -1), v2.reshape(b, 1, -1))
        kc, vc = kv_hook()                            # [B, T_max, C]
        attn, smax, av = (getattr(self, f"attn{i}"),
                          getattr(self, f"smax{i}"),
                          getattr(self, f"av{i}"))
        if (attn.is_quantized and kc.quantized):
            # one fused op per layer over the flat cache: the composed
            # triple's in-scan XLA lowering is the measured decode
            # bottleneck, and the flat kernel's DMA scales with the live
            # length (ops/attention.py); decode_attention='off' routes
            # the same op through the composed-XLA oracle
            o = fused_decode_attention(attn, smax, av, q2, kc, vc, valid,
                                       self.dim // self.heads)
        else:
            # float cache (weight_only modes): the cache is stored
            # HEAD-SPLIT [B, H, T, D] (kv_hook), so composed attention
            # reads it directly — no in-scan transpose of the cache
            qh = F.split_heads(q2.reshape(b, 1, -1), self.heads)
            kh, vh = kc, vc
            s = attn(qh, kh)                          # [B, H, 1, T_max]
            p = smax(s, valid_len=valid)
            o = av(p, vh)                             # [B, H, 1, D]
            o = F.merge_heads(o)
            o = o.reshape(b, o.shape[-1])
        o = getattr(self, f"proj{i}")(o)
        x = getattr(self, f"add1_{i}")(x, o)
        return self._mlp(i, x)

    # -- cached multi-token extend (speculative decoding's verify pass) ------
    def _extend_step(self, cache, pos, toks):
        """Process ``toks`` [B, m] at positions pos..pos+m-1 against (and
        appending to) the KV cache: the cached generalization of
        ``_decode_step`` to m query rows.

        Returns (u8 logit codes [B, m, vocab], new cache).  Row j's
        attention sees cache columns < pos + j + 1 — the per-row
        ``valid_len`` IS the causal mask over the cache, so row j
        attends to every earlier cached position plus rows 0..j of this
        extend (already appended before attention runs).  Exactness
        inherits from the single-row invariant: same integer matmuls on
        the same codes, masked columns quantize to exactly zp_p and
        contribute exactly zero.

        ``pos`` is a traced scalar or a per-row [B] vector (per-slot
        serving / per-row speculative acceptance).
        """
        b, m = toks.shape
        for i in range(1, self.depth + 1):
            k0 = cache[i][0]
            if k0.shape[2 if k0.ndim == 4 else 1] < self.max_len:
                raise NotImplementedError(
                    "multi-token extends over a RING cache would need "
                    "mid-chunk compaction; spec decode / chunked "
                    "prefill require full-length caches "
                    "(ring_cache=False)")
        per_slot = getattr(pos, "ndim", 0) == 1
        x = self._stem(Tensor(toks.astype(jnp.float32)), start=pos)
        x = x.reshape(b * m, self.dim)
        roff = jnp.arange(m, dtype=jnp.int32)
        if per_slot:
            valid = (pos.reshape(-1, 1) + roff + 1).reshape(b, 1, m, 1)
        else:
            valid = (pos + roff + 1).reshape(1, 1, m, 1)
        new_cache = {}
        for i in range(1, self.depth + 1):
            cap = {}
            k_cache, v_cache = cache[i]
            (ks, kzp), (vs, vzp) = self._kv_scales(i)

            def kv_hook(cap=cap, i=i, k_cache=k_cache, v_cache=v_cache,
                        ks=ks, kzp=kzp, vs=vs, vzp=vzp):
                kf, vf = cap[i]                  # FLAT [B, m, C] rows
                if not kf.quantized:
                    # weight_only: HEAD-SPLIT float cache [B, Hkv, T, D]
                    kh, vh = (F.split_heads(kf, self.kv_heads),
                              F.split_heads(vf, self.kv_heads))
                    if per_slot:
                        upd = jax.vmap(
                            lambda c, u, p: lax.dynamic_update_slice(
                                c, u, (0, p, 0)))
                        kc = upd(k_cache, kh.data, pos)
                        vc = upd(v_cache, vh.data, pos)
                    else:
                        kc = lax.dynamic_update_slice(
                            k_cache, kh.data, (0, 0, pos, 0))
                        vc = lax.dynamic_update_slice(
                            v_cache, vh.data, (0, 0, pos, 0))
                    new_cache[i] = (kc, vc)
                    return Tensor(kc), Tensor(vc)
                if per_slot:
                    upd = jax.vmap(
                        lambda c, u, p: lax.dynamic_update_slice(
                            c, u, (p, 0)))
                    kc = upd(k_cache, kf.data, pos)
                    vc = upd(v_cache, vf.data, pos)
                else:
                    kc = lax.dynamic_update_slice(k_cache, kf.data,
                                                  (0, pos, 0))
                    vc = lax.dynamic_update_slice(v_cache, vf.data,
                                                  (0, pos, 0))
                new_cache[i] = (kc, vc)
                return Tensor(kc, ks, kzp), Tensor(vc, vs, vzp)

            x = self._block_extend(i, x, b, m, valid, cap, kv_hook,
                                   pos=pos)
        x = self.ln_f(x)
        codes = self.head(x).data.reshape(b, m, self.vocab_size)
        return codes, new_cache

    def _block_extend(self, i, x, b, m, valid, cap, kv_hook, pos=0):
        """m-row cached block: the fused multi-position op (Pallas
        kernel on TPU — all m*H query rows in ONE call, the verify
        amortization speculative decoding needs) when the cache is
        quantized, composed XLA otherwise."""
        h = getattr(self, f"ln1_{i}")(x)
        q2, k2, v2 = self._qkv(i, h)
        cap[i] = (k2.reshape(b, m, -1), v2.reshape(b, m, -1))
        kc, vc = kv_hook()
        attn, smax, av = (getattr(self, f"attn{i}"),
                          getattr(self, f"smax{i}"),
                          getattr(self, f"av{i}"))
        if attn.is_quantized and kc.quantized:
            o = fused_extend_attention(attn, smax, av,
                                       q2.reshape(b, m, -1), kc, vc,
                                       pos + 1, self.head_dim)
            o = o.reshape(b * m, o.shape[-1])
        else:
            qh = F.split_heads(q2.reshape(b, m, -1), self.heads)
            if kc.data.ndim == 3:             # flat u8 cache [B, T, C]
                kh, vh = (F.split_heads(kc, self.kv_heads),
                          F.split_heads(vc, self.kv_heads))
            else:                             # head-split float cache
                kh, vh = kc, vc
            s = attn(qh, kh)                  # [B, H, m, T_max]
            p = smax(s, valid_len=valid)
            o = av(p, vh)
            o = F.merge_heads(o)
            o = o.reshape(b * m, o.shape[-1])
        o = getattr(self, f"proj{i}")(o)
        x = getattr(self, f"add1_{i}")(x, o)
        return self._mlp(i, x)

    def _head_scale_zp(self):
        return float(self.head.scale), int(self.head.zero_point)

    def _pick(self, codes, rng_key, temperature: float, top_k,
              top_p=None):
        """Next-token choice from u8 logit codes [B, V].

        temperature == 0 -> greedy argmax directly on the codes (the
        dequant (c - zp) * s is order-preserving, so greedy never
        dequantizes).  Otherwise sample jax.random.categorical on the
        dequantized logits / temperature, optionally restricted to the
        top_k codes (ties at the k-th value keep every tied code —
        top-k on an 8-bit grid is a threshold, not a sort) and/or the
        nucleus (top_p) set — on the 8-bit grid nucleus is ALSO a code
        threshold (``nucleus_code_floor``), no vocab-length sort."""
        if temperature == 0:
            return jnp.argmax(codes, -1).astype(jnp.int32)
        b = codes.shape[0]
        if codes.dtype == jnp.uint8:
            scale, zp = self._head_scale_zp()
            logits = (codes.astype(jnp.float32) - jnp.float32(zp)) \
                * jnp.float32(scale)
        else:                                  # weight_only: float logits
            logits = codes.astype(jnp.float32)
        topk_keep = None
        kth = None
        if top_k is not None:
            kth = lax.top_k(codes, top_k)[0][:, -1:]
            topk_keep = codes >= kth
            logits = jnp.where(topk_keep, logits, -jnp.inf)
        if top_p is not None and top_p < 1.0:
            p = jnp.full((b,), top_p, jnp.float32)
            if codes.dtype == jnp.uint8:
                # nucleus mass over the top_k-filtered codes (sequential
                # HF semantics) — identical composition to the float
                # branch, which cuts on the already-masked logits.  The
                # top_k mask is a CODE threshold, so it applies to the
                # count histogram at class level — one scatter total
                sot = jnp.full((b,), scale / temperature, jnp.float32)
                hist = code_histogram(codes)
                if kth is not None:
                    v = jnp.arange(256, dtype=codes.dtype)
                    hist = hist * (v[None, :] >= kth)
                floor = nucleus_code_floor(codes, sot, p, hist=hist)
                logits = jnp.where(codes >= floor[:, None], logits,
                                   -jnp.inf)
            else:
                lt = logits / jnp.float32(temperature)
                logits = jnp.where(lt >= nucleus_float_cutoff(lt, p),
                                   logits, -jnp.inf)
        return jax.random.categorical(
            rng_key, logits / jnp.float32(temperature), -1).astype(jnp.int32)

    def generate(self, ids, steps: int, temperature: float = 0.0,
                 top_k: int | None = None, top_p: float | None = None,
                 seed: int = 0):
        """Decode ``steps`` tokens after the prompt ``ids`` [B, T0].

        One jitted program: causal prefill + a lax.scan of cached decode
        steps, the PRNG key threaded through the carry.  INT8-only (call
        after convert()).  temperature=0 (default) is greedy; >0 samples
        softmax(logits/T), optionally over the top_k codes and/or the
        nucleus top_p set (both given: sequential HF semantics — the
        nucleus mass is measured over the already-top_k-filtered
        distribution, identically on the u8-code and float paths).

        After ``shard()`` the whole program runs under ``shard_map`` on
        the mesh: the batch splits over the data axis and the transformer
        TP roles apply per step — head-local attention decodes against a
        HEAD-SHARDED u8 KV cache (each device stores and reads only its
        heads' cache: 1/model_size the cache HBM per device), row-parallel
        proj/fc2 psum their s32 partials.  Greedy tokens are BIT-identical
        to the unsharded run; sampled runs fold the data-shard index into
        the PRNG key (each shard draws an independent stream — same
        distribution, different draws than unsharded).
        """
        if not self.is_quant:
            raise RuntimeError("generate() requires a converted model")
        ids = np.asarray(ids)
        b, t0 = ids.shape
        if steps < 1:
            raise ValueError(f"steps must be >= 1, got {steps}")
        if t0 + steps > self.max_len:
            raise ValueError(
                f"prompt {t0} + steps {steps} exceeds max_len "
                f"{self.max_len}")
        if top_p is not None and not 0.0 < top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {top_p}")
        mesh = getattr(self, "_mesh", None)
        key = (b, t0, steps, float(temperature), top_k,
               None if top_p is None else float(top_p), id(mesh))
        if not hasattr(self, "_gen_cache"):
            self._gen_cache = {}
        fn = self._gen_cache.get(key)
        if fn is None:
            def run(params, prompt, rng0):
                self._bind(params)
                try:
                    logits0, cache = self._prefill(
                        Tensor(prompt.astype(jnp.float32)))
                    k0, rng = jax.random.split(rng0)
                    tok0 = self._pick(logits0, k0, temperature, top_k,
                                      top_p)

                    def body(carry, _):
                        cache, pos, tok, rng = carry
                        logits, cache = self._decode_step(cache, pos, tok)
                        k, rng = jax.random.split(rng)
                        nxt = self._pick(logits, k, temperature, top_k,
                                         top_p)
                        return (cache, pos + 1, nxt, rng), nxt

                    if steps > 1:
                        _, rest = lax.scan(
                            body, (cache, jnp.int32(t0), tok0, rng),
                            None, length=steps - 1)
                        return jnp.concatenate(
                            [tok0[:, None], jnp.swapaxes(rest, 0, 1)], 1)
                    return tok0[:, None]
                finally:
                    self._bind(None)

            if mesh is None:
                fn = jax.jit(run)
            else:
                fn = jax.jit(self._sharded_generate_fn(run, b))
            self._gen_cache[key] = fn
        return np.asarray(fn(self._gather_params(), jnp.asarray(ids),
                             jax.random.PRNGKey(seed)))

    def generate_speculative(self, draft, ids, steps: int, k: int = 4):
        """Greedy speculative decoding: ``draft`` proposes ``k`` tokens
        per macro-step, this model verifies all k+1 positions in ONE
        cached pass, and the longest matching prefix plus the target's
        own correction token are accepted — every emitted token is the
        TARGET's greedy argmax given the accepted prefix, so the output
        equals greedy ``generate()`` token for token (pinned by
        tests/test_speculative.py).

        TPU-native design: the whole draft -> verify -> accept loop is
        ONE jitted program (``lax.while_loop`` — macro-step count is
        data-dependent), and rollback after a rejection is FREE: the
        T-major flat cache tolerates garbage rows beyond the live
        length (masked columns quantize to exactly zp_p = zero
        contribution), so "rewind" is just not advancing the position
        pointer — rejected rows are overwritten by the next append.
        Acceptance is PER ROW (each batch row advances 1..k+1 tokens per
        macro-step, like the serving engine's per-slot positions);
        finished rows freeze their pointer and park their writes in the
        buffer's scratch tail.  Decode stays memory-bound: the verify
        pass reads the weights ONCE for k+1 tokens, so the speedup
        bound is ~(k+1) x acceptance-rate at the same HBM traffic.

        ``draft`` must be a converted decoder over the same vocabulary
        (any architecture — e.g. a 2-layer gpt drafting for a llama).
        Needs ``t0 + steps + k + 1 <= max_len`` headroom on both models
        (the last macro-step may transiently write k tokens past the
        accepted length).
        """
        if not (self.is_quant and draft.is_quant):
            raise RuntimeError(
                "generate_speculative() requires converted target and "
                "draft models")
        if draft.vocab_size != self.vocab_size:
            raise ValueError(
                f"draft vocab {draft.vocab_size} != target vocab "
                f"{self.vocab_size}")
        if getattr(draft, "_mesh", None) is not None:
            raise NotImplementedError(
                "speculative decoding needs an UNSHARDED draft (the "
                "draft is small by construction — shard the target, "
                "replicate the draft).  A sharded TARGET is supported: "
                "the whole draft->verify->accept loop runs under "
                "shard_map (round-5; tests/test_speculative.py)")
        ids = np.asarray(ids)
        b, t0 = ids.shape
        if steps < 1:
            raise ValueError(f"steps must be >= 1, got {steps}")
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        need = t0 + steps + k + 1
        if need > self.max_len or need > draft.max_len:
            raise ValueError(
                f"prompt {t0} + steps {steps} + draft depth {k} + 1 "
                f"exceeds max_len (target {self.max_len}, draft "
                f"{draft.max_len}) — speculative decoding needs k+1 "
                f"rows of overshoot headroom")
        if not hasattr(self, "_spec_cache"):
            self._spec_cache = {}
        mesh = getattr(self, "_mesh", None)
        key = (b, t0, steps, k, id(draft), id(mesh))
        fn = self._spec_cache.get(key)
        if fn is None:
            # bounded: each entry pins a compiled program AND the draft
            # it closes over; varying (b, t0, steps, k) or rotating
            # drafts must not accumulate forever (round-3 review)
            if len(self._spec_cache) >= 8:
                self._spec_cache.pop(next(iter(self._spec_cache)))
            width = steps + k + 1

            def run(tparams, dparams, prompt):
                self._bind(tparams)
                draft._bind(dparams, merge=True)
                try:
                    logits0, tcache = self._prefill(
                        Tensor(prompt.astype(jnp.float32)))
                    _, dcache = draft._prefill(
                        Tensor(prompt.astype(jnp.float32)))
                    tok0 = jnp.argmax(logits0, -1).astype(jnp.int32)
                    # LOCAL row count: under a sharded target this run
                    # traces per data shard with b/data_size rows
                    bl = prompt.shape[0]
                    outbuf = jnp.zeros((bl, width), jnp.int32) \
                        .at[:, 0].set(tok0)
                    n_out = jnp.ones((bl,), jnp.int32)
                    pos0 = jnp.full((bl,), t0, jnp.int32)

                    def cond(carry):
                        return jnp.any(carry[5] < steps)

                    def body(carry):
                        tcache, dcache, pos, tok, outbuf, n_out = carry

                        # 1) draft k greedy tokens (cached scan).  The
                        # scan runs k+1 steps: step i writes the k/v of
                        # its INPUT token (tok, d_1, ..) at pos+i, so
                        # the extra step is what appends d_k's k/v at
                        # pos+k — without it, a fully-accepted round
                        # (a == k) advances pos past a never-written
                        # draft row and every later draft step attends
                        # over stale garbage there (output stays
                        # target-exact; draft acceptance silently
                        # degrades in exactly the high-acceptance
                        # regime).  Its emitted token is discarded.
                        def dstep(c, _):
                            dc, dpos, dtok = c
                            codes, dc = draft._decode_step(dc, dpos,
                                                           dtok)
                            nxt = jnp.argmax(codes, -1).astype(jnp.int32)
                            return (dc, dpos + 1, nxt), nxt

                        (dcache, _, _), dtoks = lax.scan(
                            dstep, (dcache, pos, tok), None, length=k + 1)
                        dtoks = jnp.swapaxes(dtoks[:k], 0, 1)   # [B, k]

                        # 2) target verifies [tok, d_1..d_k] in one pass
                        toks_v = jnp.concatenate([tok[:, None], dtoks],
                                                 1)
                        codes, tcache = self._extend_step(tcache, pos,
                                                          toks_v)
                        g = jnp.argmax(codes, -1).astype(jnp.int32)

                        # 3) accept longest matching prefix + correction
                        match = (dtoks == g[:, :k]).astype(jnp.int32)
                        a = jnp.sum(jnp.cumprod(match, 1), 1)   # [B]
                        active = n_out < steps
                        na = jnp.where(active, a + 1, 0)

                        # 4) emit: write all k+1 candidates at the row's
                        # offset — only the first na survive (the next
                        # macro-step overwrites the rest); frozen rows
                        # park their writes in the scratch tail
                        # [steps, width)
                        def wr(buf, row, off):
                            return lax.dynamic_update_slice(buf, row,
                                                            (off,))

                        outbuf = jax.vmap(wr)(
                            outbuf, g,
                            jnp.where(active, n_out, width - (k + 1)))
                        tok = jnp.where(
                            active,
                            jnp.take_along_axis(g, a[:, None], 1)[:, 0],
                            tok)
                        # the draft cache needs no rollback either: rows
                        # [pos, pos+a] hold the ACCEPTED tokens' k/v
                        # (matched drafts; the k+1-length draft scan
                        # covers a == k), rows beyond are dead
                        return (tcache, dcache, pos + na, tok, outbuf,
                                n_out + na)

                    carry = lax.while_loop(
                        cond, body,
                        (tcache, dcache, pos0, tok0, outbuf, n_out))
                    return carry[4][:, :steps]
                finally:
                    self._bind(None)

            if mesh is None:
                fn = jax.jit(run)
            else:
                fn = jax.jit(self._sharded_spec_fn(run, draft, b))
            self._spec_cache[key] = fn
        return np.asarray(fn(self._gather_params(),
                             draft._gather_params(), jnp.asarray(ids)))

    def _sharded_spec_fn(self, run, draft, b: int):
        """Sharded-target speculative decoding (round-5 VERDICT #6):
        the serving-relevant combination is a TP-sharded target with a
        small REPLICATED draft.  The whole draft->verify->accept
        while_loop runs under shard_map — target layers use their TP
        roles (head-sharded caches, row-parallel psums; the verify pass
        is the same sharded multi-position extend TP generate already
        runs), the draft's params enter with replicated specs and its
        compute repeats identically on every shard.  Per-data-group
        loop exits are legal for the same reason as the sharded
        engine's multi-chunk drain: collectives pair across the model
        axis only, whose members share their rows' acceptance history.
        Greedy target argmaxes are integer-exact under TP, so spec ==
        sharded greedy generate() bit-for-bit."""
        from jax.sharding import PartitionSpec as P

        from ..parallel.context import axes as axes_ctx

        mesh, pa, specs = self._mesh, self._parallel_axes, self._tp_specs
        if b % pa.data_size:
            raise ValueError(
                f"generate_speculative() on a ({pa.data_size}, "
                f"{pa.model_size}) mesh needs batch % {pa.data_size} "
                f"== 0, got {b}")
        dspecs = jax.tree.map(lambda _: P(), draft._gather_params())

        def sharded(tparams, dparams, prompt):
            def local_fn(tp, dp, pr):
                with axes_ctx(pa):
                    return run(tp, dp, pr)

            return jax.shard_map(
                local_fn, mesh=mesh,
                in_specs=(specs, dspecs, P(pa.data_axis)),
                out_specs=P(pa.data_axis),
                check_vma=False,
            )(tparams, dparams, prompt)

        return sharded

    def _sharded_generate_fn(self, run, b: int):
        """Wrap ``run`` in shard_map over the model's mesh: prompt rows
        split over the data axis, params at their placed specs, the
        transformer TP context active inside (head-sharded KV cache,
        row-parallel psums)."""
        from jax.sharding import PartitionSpec as P

        from ..parallel.context import axes as axes_ctx

        mesh, pa, specs = self._mesh, self._parallel_axes, self._tp_specs
        if b % pa.data_size:
            raise ValueError(
                f"generate() on a ({pa.data_size}, {pa.model_size}) mesh "
                f"needs batch % {pa.data_size} == 0, got {b}")

        def sharded(params, prompt, rng0):
            def local_fn(local_params, local_prompt, rng):
                self._bind(local_params)
                try:
                    with axes_ctx(pa):
                        # independent sampling stream per data shard
                        # (unused when temperature == 0)
                        rng = jax.random.fold_in(
                            rng, lax.axis_index(pa.data_axis))
                        return run(local_params, local_prompt, rng)
                finally:
                    self._bind(None)

            return jax.shard_map(
                local_fn, mesh=mesh,
                in_specs=(specs, P(pa.data_axis), P()),
                out_specs=P(pa.data_axis),
                check_vma=False,
            )(params, prompt, rng0)

        return sharded


def torch_text_decoder(vocab_size: int = 1000, max_len: int = 64,
                       dim: int = 128, depth: int = 2, heads: int = 2,
                       mlp_ratio: int = 4, seed: int = 42,
                       act: str = "gelu"):
    """Matching torch oracle (same attribute names -> state_dict loads).
    ``act='relu'`` is the OPT-family MLP."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as tF

    torch.manual_seed(seed)
    hd = dim // heads

    class PE(nn.Module):
        def __init__(self):
            super().__init__()
            self.weight = nn.Parameter(torch.randn(max_len, dim) * 0.02)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Embedding(vocab_size, dim)
            self.pe = PE()
            for i in range(1, depth + 1):
                setattr(self, f"ln1_{i}", nn.LayerNorm(dim))
                for w in ("wq", "wk", "wv"):
                    setattr(self, f"{w}{i}", nn.Linear(dim, dim))
                setattr(self, f"proj{i}", nn.Linear(dim, dim))
                setattr(self, f"ln2_{i}", nn.LayerNorm(dim))
                setattr(self, f"fc1_{i}", nn.Linear(dim, mlp_ratio * dim))
                setattr(self, f"fc2_{i}", nn.Linear(mlp_ratio * dim, dim))
            self.ln_f = nn.LayerNorm(dim)
            self.head = nn.Linear(dim, vocab_size)

        def forward(self, ids):
            b, t = ids.shape
            x = self.embed(ids) + self.pe.weight[:t]
            mask = torch.triu(torch.full((t, t), float("-inf")), 1)
            for i in range(1, depth + 1):
                h = getattr(self, f"ln1_{i}")(x)

                def heads_of(z):
                    return z.reshape(b, -1, heads, hd).transpose(1, 2)
                q = heads_of(getattr(self, f"wq{i}")(h))
                k = heads_of(getattr(self, f"wk{i}")(h))
                v = heads_of(getattr(self, f"wv{i}")(h))
                s = (q @ k.transpose(-1, -2)) * hd ** -0.5 + mask
                p = tF.softmax(s, dim=-1)
                o = (p @ v).transpose(1, 2).reshape(b, -1, dim)
                x = x + getattr(self, f"proj{i}")(o)
                h = getattr(self, f"ln2_{i}")(x)
                h = getattr(self, f"fc2_{i}")(
                    (tF.relu if act == "relu" else tF.gelu)(
                        getattr(self, f"fc1_{i}")(h)))
                x = x + h
            return self.head(self.ln_f(x))

    return Net()
