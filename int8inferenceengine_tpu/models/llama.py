"""LlamaDecoder: the llama-family INT8 LM (RMSNorm / RoPE / GQA / SwiGLU).

Not in the reference (its only model family is CNNs; SURVEY.md §2.3) —
this extends the framework's decoder line (models/text_decoder.py) to
the architecture every modern open LM serves: pre-RMSNorm blocks,
rotary positions on q/k (ops/rope.py), grouped-query attention with a
kv-compact cache, bias-free projections, and a SwiGLU MLP.

It subclasses TextDecoder and overrides only the block bodies — the
entire decode machinery (u8 T-major flat KV cache, fused decode
attention, one-jitted-program generate(), the continuous-batching
engine, TP generate under shard_map) is inherited unchanged:

* **RoPE defines the KV-cache grid**: the cache stores POST-rotation k
  codes quantized at the k-side QuantRoPE layer's calibrated (scale,
  zp) — ``_kv_scales`` points there instead of at wk.  Prefill and
  decode compute angles from the same static inv_freq (ops/rope.py),
  so cached codes are bit-identical whichever path wrote them and the
  cached-decode == full-forward invariant carries over verbatim
  (tests/test_llama.py).
* **GQA stays kv-compact end to end**: wk/wv project to
  ``kv_heads * head_dim`` channels, the cache stores only kv heads
  (cache HBM shrinks by heads/kv_heads), and the decode attention
  batches each kv group's query heads as the matmul M dim
  (ops/attention.decode_attention_flat) — kv is never expanded in the
  decode hot loop.  The prefill/full forward expands views via
  ``F.repeat_kv`` (broadcast, no copy until XLA decides).
* **SwiGLU** = down(silu(gate(x)) * up(x)): gate rides the fused
  Linear+silu epilogue (ops/gemm_int8 KERNEL_ACTS), the elementwise
  product is a calibrated QuantMul, all three Linears are bias-free
  (zero bias quantizes to exactly zero — nothing special-cased).

TP plan (tp_roles): wq/wk/wv column-parallel head-local (requires both
heads and kv_heads to divide the model axis so query groups stay whole
per shard), proj/down row-parallel, gate/up column-parallel with the
QuantMul/silu interior running on aligned local shards.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, QuantConfig
from ..layers import (Linear, QuantAct, QuantAdd, QuantEmbed, QuantMatmul,
                      QuantMul, QuantRMSNorm, QuantRoPE, QuantSoftmax,
                      fused_decode_attention, fused_extend_attention,
                      fused_linear_act, fused_w4a8_multi)
from ..module import Module
from ..ops import functional as F
from ..tensor import Tensor
from .text_decoder import TextDecoder

__all__ = ["LlamaDecoder", "torch_llama"]


def swiglu_hidden(dim: int, multiple_of: int = 64) -> int:
    """The llama MLP width rule: ``int(2 * 4*dim / 3)`` (FLOOR, matching
    the Llama reference implementation), rounded UP to a multiple
    (Touvron et al. '23 use multiple_of=256; 64 keeps toy dims sane).

    The floor is kept for formula parity with the reference code, not
    because it changes the result: for integer ``dim`` the pre-rounding
    values ``(8*dim) // 3`` and ``(8*dim + 2) // 3`` never straddle a
    multiple-of-64 boundary (8*dim is divisible by 8, which is
    incompatible with 3*64j + 1 or 3*64j + 2), so floor and ceil round
    up to the same width.  Real checkpoints should pass ``mlp_hidden``
    explicitly when their config says so."""
    h = (8 * dim) // 3
    return -(-h // multiple_of) * multiple_of


class LlamaDecoder(TextDecoder):
    """Causal llama-family LM (llama_tiny defaults: 128 dim / 2 blocks /
    4 query heads over 2 kv heads).

    Per block i: ``ln1_{i}`` (RMSNorm) -> ``wq{i}``/``wk{i}``/``wv{i}``
    (bias-free; k/v at kv_heads width) -> ``rq{i}``/``rk{i}`` (RoPE) ->
    ``attn{i}`` -> ``smax{i}`` -> ``av{i}`` -> ``proj{i}`` -> ``add1_{i}``;
    then ``ln2_{i}`` -> ``gate{i}``+``silu{i}`` / ``up{i}`` -> ``mul{i}``
    -> ``down{i}`` -> ``add2_{i}``.  Head: ``ln_f`` -> ``head``.
    """

    def __init__(self, vocab_size: int = 1000, max_len: int = 64,
                 dim: int = 128, depth: int = 2, heads: int = 4,
                 kv_heads: int | None = None, mlp_hidden: int | None = None,
                 rope_base: float = 10000.0, rope_scaling=None,
                 sliding_window: int | None = None,
                 ring_cache: bool = False,
                 eps: float = 1e-6,
                 config: QuantConfig = DEFAULT_CONFIG):
        Module.__init__(self, config)
        kv_heads = heads if kv_heads is None else int(kv_heads)
        if dim % heads:
            raise ValueError(f"dim {dim} not divisible by heads {heads}")
        if heads % kv_heads:
            raise ValueError(
                f"heads {heads} not divisible by kv_heads {kv_heads}")
        self.vocab_size, self.max_len = vocab_size, max_len
        self.dim, self.depth, self.heads = dim, depth, heads
        self.kv_heads = kv_heads
        self.head_dim = dim // heads
        self.mlp_hidden = (swiglu_hidden(dim) if mlp_hidden is None
                           else int(mlp_hidden))
        # mistral-family sliding-window attention: every position
        # attends to at most the last ``sliding_window`` positions.
        # The windowed causal mask runs in QuantSoftmax (prefill / full
        # forward) and in the flat decode kernel's span ladder (decode
        # DMA + compute capped at ~window regardless of context; see
        # ops/attention.py).  The KV cache still holds max_len rows (a
        # rolling ring cache is the follow-on memory lever).
        self.sliding_window = (None if sliding_window is None
                               else int(sliding_window))
        # ring_cache=True: windowed layers allocate roundup32(2W) cache
        # rows instead of max_len and slide by compaction (one W-row
        # contiguous copy per R-W steps) — generate()-only memory lever
        # for long contexts; see TextDecoder._cache_rows.
        if ring_cache and self.sliding_window is None:
            raise ValueError("ring_cache requires sliding_window")
        self.ring_cache = bool(ring_cache)
        self.INPUT_SHAPE = (max_len,)
        kv_dim = kv_heads * self.head_dim
        self.embed = QuantEmbed(vocab_size, dim, config=config)
        for i in range(1, depth + 1):
            setattr(self, f"ln1_{i}", QuantRMSNorm(dim, eps, config=config))
            setattr(self, f"wq{i}", Linear(dim, dim, config=config))
            setattr(self, f"wk{i}", Linear(dim, kv_dim, config=config))
            setattr(self, f"wv{i}", Linear(dim, kv_dim, config=config))
            setattr(self, f"rq{i}", QuantRoPE(self.head_dim, rope_base,
                                              config=config,
                                              scaling=rope_scaling))
            setattr(self, f"rk{i}", QuantRoPE(self.head_dim, rope_base,
                                              config=config,
                                              scaling=rope_scaling))
            setattr(self, f"attn{i}", QuantMatmul(
                alpha=self.head_dim ** -0.5, transpose_b=True,
                config=config))
            setattr(self, f"smax{i}", QuantSoftmax(
                config=config, causal=True, window=self.sliding_window))
            setattr(self, f"av{i}", QuantMatmul(config=config))
            setattr(self, f"proj{i}", Linear(dim, dim, config=config))
            setattr(self, f"add1_{i}", QuantAdd(config=config))
            setattr(self, f"ln2_{i}", QuantRMSNorm(dim, eps, config=config))
            setattr(self, f"gate{i}", Linear(dim, self.mlp_hidden,
                                             config=config))
            setattr(self, f"silu{i}", QuantAct("silu", config=config))
            setattr(self, f"up{i}", Linear(dim, self.mlp_hidden,
                                           config=config))
            setattr(self, f"mul{i}", QuantMul(config=config))
            setattr(self, f"down{i}", Linear(self.mlp_hidden, dim,
                                             config=config))
            setattr(self, f"add2_{i}", QuantAdd(config=config))
        self.ln_f = QuantRMSNorm(dim, eps, config=config)
        self.head = Linear(dim, vocab_size, config=config)

    def tp_roles(self, model_size: int) -> dict:
        """Megatron plan for the llama block: attention head-local only
        when BOTH head counts divide the model axis (each shard then
        holds whole kv groups, so its query heads find their kv heads
        locally); SwiGLU column-parallel with a row-parallel down."""
        roles = {}
        head_local = (self.heads % model_size == 0
                      and self.kv_heads % model_size == 0)
        for i in range(1, self.depth + 1):
            if head_local:
                for w in ("wq", "wk", "wv"):
                    roles[f"{w}{i}"] = "col_local"
            roles[f"proj{i}"] = "row"
            roles[f"gate{i}"] = "col_local"
            roles[f"up{i}"] = "col_local"
            roles[f"down{i}"] = "row"
        return roles

    # -- block bodies (the only decode-machinery overrides) -----------------
    def _stem(self, ids: Tensor, start=None) -> Tensor:
        # no additive position table: positions enter via RoPE in-block
        return self.embed(ids)

    def _kv_scales(self, i):
        # the cache stores POST-RoPE k codes: rk defines k's grid
        rk, wv = getattr(self, f"rk{i}"), getattr(self, f"wv{i}")
        return (rk.scale, rk.zero_point), (wv.scale, wv.zero_point)

    def _attn_out(self, i, o):
        # hook: the gemma family post-norms the attention output before
        # the residual add (models/gemma.py); llama is the identity
        return o

    def _residual(self, i, x, o):
        # hook: the block tail after attention.  Llama/gemma are
        # SEQUENTIAL (mlp reads the post-attention residual); the
        # neox/phi family overrides with the PARALLEL form
        # x + attn(ln1 x) + mlp(ln2 x) (models/neox.py).
        x = getattr(self, f"add1_{i}")(x, o)
        return self._mlp(i, x)

    def _mlp(self, i, x):
        h = getattr(self, f"ln2_{i}")(x)
        gate, silu = getattr(self, f"gate{i}"), getattr(self, f"silu{i}")
        up = getattr(self, f"up{i}")
        if self.config.weight_bits == 4 and not self.config.weight_only:
            # W4A8: gate+up share h — one merged kernel call
            # (bit-identical to the pair; layers.fused_w4a8_multi)
            merged = fused_w4a8_multi((gate, up), h)
            if merged is not None:
                m = getattr(self, f"mul{i}")(silu(merged[0]), merged[1])
                return getattr(self, f"add2_{i}")(
                    x, getattr(self, f"down{i}")(m))
        if gate.is_quantized and self.config.fuse_linear_act:
            g = fused_linear_act(gate, silu, h)
        else:
            g = silu(gate(h))
        m = getattr(self, f"mul{i}")(g, up(h))
        return getattr(self, f"add2_{i}")(x, getattr(self, f"down{i}")(m))

    def _block(self, i, x, b, t, capture=None, start=0):
        h = getattr(self, f"ln1_{i}")(x)
        q2, k2, v2 = self._qkv(i, h)
        # -1 widths: local channel shards under head-parallel TP
        qh = F.split_heads(q2.reshape(b, t, -1), self.heads)
        kh = F.split_heads(k2.reshape(b, t, -1), self.kv_heads)
        vh = F.split_heads(v2.reshape(b, t, -1), self.kv_heads)
        qh = getattr(self, f"rq{i}")(qh, start=start)
        kh = getattr(self, f"rk{i}")(kh, start=start)
        if capture is not None:
            # POST-rotation k rows: the cache grid is rk's (scale, zp),
            # and decode rotates its fresh k at pos with the same static
            # inv_freq -> cached codes bit-match either path
            capture[i] = (F.merge_heads(kh), v2.reshape(b, t, -1))
        grp = qh.data.shape[1] // kh.data.shape[1]
        s = getattr(self, f"attn{i}")(qh, F.repeat_kv(kh, grp))
        p = getattr(self, f"smax{i}")(s)
        o = getattr(self, f"av{i}")(p, F.repeat_kv(vh, grp))
        o = F.merge_heads(o)
        o = o.reshape(b * t, o.shape[-1])
        o = self._attn_out(i, getattr(self, f"proj{i}")(o))
        return self._residual(i, x, o)

    def _block_decode(self, i, x, b, valid, cap, kv_hook, pos=0):
        h = getattr(self, f"ln1_{i}")(x)
        q2, k2, v2 = self._qkv(i, h)
        qh = F.split_heads(q2.reshape(b, 1, -1), self.heads)
        kh = F.split_heads(k2.reshape(b, 1, -1), self.kv_heads)
        qh = getattr(self, f"rq{i}")(qh, start=pos)
        kh = getattr(self, f"rk{i}")(kh, start=pos)
        # FLAT [B, 1, Hkv*D] post-RoPE rows into the T-major cache
        cap[i] = (F.merge_heads(kh), v2.reshape(b, 1, -1))
        kc, vc = kv_hook()
        attn, smax, av = (getattr(self, f"attn{i}"),
                          getattr(self, f"smax{i}"),
                          getattr(self, f"av{i}"))
        if attn.is_quantized and kc.quantized:
            # kv-compact fused op: GQA grouping happens inside
            # ops/attention.decode_attention_flat (query groups ride the
            # matmul M dim; the cache is never expanded)
            q_flat = F.merge_heads(qh).reshape(b, -1)
            o = fused_decode_attention(attn, smax, av, q_flat, kc, vc,
                                       valid, self.head_dim)
        else:
            # float cache (weight_only modes), HEAD-SPLIT [B, Hkv, T, D]:
            # expand kv views to the query head count (broadcast; XLA
            # fuses it into the batched matmul)
            grp = qh.data.shape[1] // kc.data.shape[1]
            s = attn(qh, F.repeat_kv(kc, grp))
            p = smax(s, valid_len=valid)
            o = av(p, F.repeat_kv(vc, grp))
            o = F.merge_heads(o)
            o = o.reshape(b, o.shape[-1])
        o = self._attn_out(i, getattr(self, f"proj{i}")(o))
        return self._residual(i, x, o)

    def _block_extend(self, i, x, b, m, valid, cap, kv_hook, pos=0):
        """m-row cached block (speculative verify): RoPE at positions
        pos..pos+m-1 (per-row pos vectors broadcast through QuantRoPE),
        post-rotation k codes appended, composed GQA attention against
        the kv-compact cache with the per-row valid mask."""
        h = getattr(self, f"ln1_{i}")(x)
        q2, k2, v2 = self._qkv(i, h)
        qh = F.split_heads(q2.reshape(b, m, -1), self.heads)
        kh = F.split_heads(k2.reshape(b, m, -1), self.kv_heads)
        qh = getattr(self, f"rq{i}")(qh, start=pos)
        kh = getattr(self, f"rk{i}")(kh, start=pos)
        cap[i] = (F.merge_heads(kh), v2.reshape(b, m, -1))
        kc, vc = kv_hook()
        attn, smax, av = (getattr(self, f"attn{i}"),
                          getattr(self, f"smax{i}"),
                          getattr(self, f"av{i}"))
        if attn.is_quantized and kc.quantized:
            # fused multi-position GQA against the kv-compact cache
            o = fused_extend_attention(attn, smax, av, F.merge_heads(qh),
                                       kc, vc, pos + 1, self.head_dim)
            o = o.reshape(b * m, o.shape[-1])
        else:
            if kc.data.ndim == 3:           # flat u8 kv-compact cache
                kh4, vh4 = (F.split_heads(kc, self.kv_heads),
                            F.split_heads(vc, self.kv_heads))
            else:                           # head-split float cache
                kh4, vh4 = kc, vc
            grp = qh.data.shape[1] // kh4.data.shape[1]
            s = attn(qh, F.repeat_kv(kh4, grp))
            p = smax(s, valid_len=valid)
            o = av(p, F.repeat_kv(vh4, grp))
            o = F.merge_heads(o)
            o = o.reshape(b * m, o.shape[-1])
        o = self._attn_out(i, getattr(self, f"proj{i}")(o))
        return self._residual(i, x, o)


def torch_llama(vocab_size: int = 1000, max_len: int = 64, dim: int = 128,
                depth: int = 2, heads: int = 4, kv_heads: int | None = None,
                mlp_hidden: int | None = None, rope_base: float = 10000.0,
                eps: float = 1e-6, seed: int = 42,
                sliding_window: int | None = None):
    """Matching torch oracle (same attribute names -> state_dict loads;
    bias-free Linears leave the engine's zero biases untouched).
    ``sliding_window`` adds the mistral-family band mask (position t
    attends to (t - W, t]), the oracle for
    LlamaDecoder(sliding_window=)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as tF

    torch.manual_seed(seed)
    kv = heads if kv_heads is None else kv_heads
    hd = dim // heads
    hidden = swiglu_hidden(dim) if mlp_hidden is None else mlp_hidden
    grp = heads // kv

    class RMSNorm(nn.Module):
        def __init__(self, d):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(d))

        def forward(self, x):
            ms = x.pow(2).mean(-1, keepdim=True)
            return x * torch.rsqrt(ms + eps) * self.weight

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Embedding(vocab_size, dim)
            for i in range(1, depth + 1):
                setattr(self, f"ln1_{i}", RMSNorm(dim))
                setattr(self, f"wq{i}", nn.Linear(dim, dim, bias=False))
                setattr(self, f"wk{i}", nn.Linear(dim, kv * hd, bias=False))
                setattr(self, f"wv{i}", nn.Linear(dim, kv * hd, bias=False))
                setattr(self, f"proj{i}", nn.Linear(dim, dim, bias=False))
                setattr(self, f"ln2_{i}", RMSNorm(dim))
                setattr(self, f"gate{i}", nn.Linear(dim, hidden, bias=False))
                setattr(self, f"up{i}", nn.Linear(dim, hidden, bias=False))
                setattr(self, f"down{i}", nn.Linear(hidden, dim, bias=False))
            self.ln_f = RMSNorm(dim)
            self.head = nn.Linear(dim, vocab_size, bias=False)

        def forward(self, ids):
            b, t = ids.shape
            x = self.embed(ids)
            mask = torch.triu(torch.full((t, t), float("-inf")), 1)
            if sliding_window is not None:
                # band: keep cols in (row - W, row]
                mask = mask + torch.tril(
                    torch.full((t, t), float("-inf")), -sliding_window)
            half = hd // 2
            inv = rope_base ** (-torch.arange(half, dtype=torch.float32)
                                * (2.0 / hd))
            ang = torch.arange(t, dtype=torch.float32)[:, None] * inv
            cos, sin = torch.cos(ang), torch.sin(ang)    # [T, D/2]

            def rot(z):                                   # [B, H, T, D]
                z1, z2 = z[..., :half], z[..., half:]
                return torch.cat([z1 * cos - z2 * sin,
                                  z2 * cos + z1 * sin], dim=-1)

            for i in range(1, depth + 1):
                h = getattr(self, f"ln1_{i}")(x)

                def heads_of(z, n):
                    return z.reshape(b, -1, n, hd).transpose(1, 2)
                qh = rot(heads_of(getattr(self, f"wq{i}")(h), heads))
                kh = rot(heads_of(getattr(self, f"wk{i}")(h), kv))
                vh = heads_of(getattr(self, f"wv{i}")(h), kv)
                kh = kh.repeat_interleave(grp, dim=1)
                vh = vh.repeat_interleave(grp, dim=1)
                s = (qh @ kh.transpose(-1, -2)) * hd ** -0.5 + mask
                p = tF.softmax(s, dim=-1)
                o = (p @ vh).transpose(1, 2).reshape(b, -1, dim)
                x = x + getattr(self, f"proj{i}")(o)
                h = getattr(self, f"ln2_{i}")(x)
                g = tF.silu(getattr(self, f"gate{i}")(h))
                x = x + getattr(self, f"down{i}")(
                    g * getattr(self, f"up{i}")(h))
            return self.head(self.ln_f(x))

    return Net()
