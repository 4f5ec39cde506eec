"""GemmaDecoder: the gemma-2-family INT8 LM.

Not in the reference (CNN-only zoo, SURVEY.md §2.3) — extends the
llama-family decoder (models/llama.py) with the gemma-2 architecture
deltas, reusing ALL of its machinery (RoPE, GQA kv-compact cache, flat
decode kernel, generate/engine/speculative/TP) through the block
hooks:

* **unit-offset RMSNorm** (``QuantRMSNorm(unit_offset=True)``): gemma
  checkpoints store norm weights as deltas around 1.
* **Sandwich norms**: post-attention and post-feedforward RMSNorms
  before each residual add (``postn1_{i}`` via the ``_attn_out`` hook,
  ``postn2_{i}`` inside ``_mlp``), on top of the usual pre-norms.
* **GeGLU MLP**: tanh-approximate gelu on the gate
  (``QuantAct("gelu_tanh")`` — gemma's gelu_pytorch_tanh).
* **Attention logit softcapping**: scores pass
  ``cap * tanh(x / cap)`` before masking+softmax
  (``QuantSoftmax(softcap=)``; the decode kernel applies the same cap
  in its tail — ops/attention.py).  The in-kernel tanh LOWERS AND RUNS
  on v5e (tools/gemma_window_chip.py, 2026-08-21: bit-exact vs the
  composed path at T=2048, valid 1/300/1900, every window x softcap
  combination; the cap costs ~0.4-2 us/call).  If a future Mosaic
  version ever rejects the tanh lowering,
  ``QuantConfig(decode_attention="xla")`` routes gemma decode through
  the composed path unchanged.
* **Final logit softcapping**: applied on the FP32 forward (torch
  parity); on the INT8 path tanh is monotone so greedy argmax over the
  logit codes is unchanged — the cap is a no-op for greedy decoding
  and is documented as unapplied for sampled INT8 logits.
* **Embedding scaling** by sqrt(dim): a pure (scale, zero_point)
  rescale of the embedding output tensor — exact, no code changes.
* **Alternating sliding-window attention**: odd blocks (1-indexed)
  attend within ``sliding_window``, even blocks globally — the
  gemma-2 local/global interleave, riding the round-4 windowed span
  ladder per layer.
* **head_dim decoupled from dim/heads** (gemma-2 uses wide heads):
  q projects to ``heads * head_dim``, k/v to ``kv_heads * head_dim``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, QuantConfig
from ..layers import (Linear, QuantAct, QuantAdd, QuantEmbed, QuantMatmul,
                      QuantMul, QuantRMSNorm, QuantRoPE, QuantSoftmax)
from ..module import Module
from ..tensor import Tensor
from .llama import LlamaDecoder

__all__ = ["GemmaDecoder", "torch_gemma"]


class GemmaDecoder(LlamaDecoder):
    """gemma-2-family causal LM (gemma_tiny defaults: 128 dim /
    2 blocks / 4 query heads over 2 kv heads, window on odd blocks)."""

    def __init__(self, vocab_size: int = 1000, max_len: int = 64,
                 dim: int = 128, depth: int = 2, heads: int = 4,
                 kv_heads: int | None = None, head_dim: int | None = None,
                 mlp_hidden: int | None = None,
                 rope_base: float = 10000.0,
                 sliding_window: int | None = 32,
                 ring_cache: bool = False,
                 attn_softcap: float = 50.0,
                 final_softcap: float = 30.0,
                 eps: float = 1e-6,
                 config: QuantConfig = DEFAULT_CONFIG):
        Module.__init__(self, config)
        kv_heads = heads if kv_heads is None else int(kv_heads)
        if heads % kv_heads:
            raise ValueError(
                f"heads {heads} not divisible by kv_heads {kv_heads}")
        head_dim = (dim // heads) if head_dim is None else int(head_dim)
        self.vocab_size, self.max_len = vocab_size, max_len
        self.dim, self.depth, self.heads = dim, depth, heads
        self.kv_heads = kv_heads
        self.head_dim = head_dim
        self.mlp_hidden = (4 * dim if mlp_hidden is None
                           else int(mlp_hidden))
        self.sliding_window = (None if sliding_window is None
                               else int(sliding_window))
        # ring caches apply to the LOCAL (windowed, odd) blocks only;
        # global blocks keep max_len rows (TextDecoder._cache_rows
        # decides per layer from each smax's window)
        if ring_cache and self.sliding_window is None:
            raise ValueError("ring_cache requires sliding_window")
        self.ring_cache = bool(ring_cache)
        self.attn_softcap = float(attn_softcap)
        self.final_softcap = float(final_softcap)
        self.INPUT_SHAPE = (max_len,)
        q_dim = heads * head_dim
        kv_dim = kv_heads * head_dim
        self.embed = QuantEmbed(vocab_size, dim, config=config)
        for i in range(1, depth + 1):
            # odd blocks local, even blocks global — gemma-2 interleave
            win = self.sliding_window if i % 2 == 1 else None
            setattr(self, f"ln1_{i}", QuantRMSNorm(dim, eps,
                                                   config=config,
                                                   unit_offset=True))
            setattr(self, f"wq{i}", Linear(dim, q_dim, config=config))
            setattr(self, f"wk{i}", Linear(dim, kv_dim, config=config))
            setattr(self, f"wv{i}", Linear(dim, kv_dim, config=config))
            setattr(self, f"rq{i}", QuantRoPE(head_dim, rope_base,
                                              config=config))
            setattr(self, f"rk{i}", QuantRoPE(head_dim, rope_base,
                                              config=config))
            setattr(self, f"attn{i}", QuantMatmul(
                alpha=head_dim ** -0.5, transpose_b=True, config=config))
            setattr(self, f"smax{i}", QuantSoftmax(
                config=config, causal=True, window=win,
                softcap=self.attn_softcap))
            setattr(self, f"av{i}", QuantMatmul(config=config))
            setattr(self, f"proj{i}", Linear(q_dim, dim, config=config))
            setattr(self, f"postn1_{i}", QuantRMSNorm(dim, eps,
                                                      config=config,
                                                      unit_offset=True))
            setattr(self, f"add1_{i}", QuantAdd(config=config))
            setattr(self, f"ln2_{i}", QuantRMSNorm(dim, eps,
                                                   config=config,
                                                   unit_offset=True))
            setattr(self, f"gate{i}", Linear(dim, self.mlp_hidden,
                                             config=config))
            setattr(self, f"gelu{i}", QuantAct("gelu_tanh",
                                               config=config))
            setattr(self, f"up{i}", Linear(dim, self.mlp_hidden,
                                           config=config))
            setattr(self, f"mul{i}", QuantMul(config=config))
            setattr(self, f"down{i}", Linear(self.mlp_hidden, dim,
                                             config=config))
            setattr(self, f"postn2_{i}", QuantRMSNorm(dim, eps,
                                                      config=config,
                                                      unit_offset=True))
            setattr(self, f"add2_{i}", QuantAdd(config=config))
        self.ln_f = QuantRMSNorm(dim, eps, config=config,
                                 unit_offset=True)
        self.head = Linear(dim, vocab_size, config=config)

    def tp_roles(self, model_size: int) -> dict:
        roles = super().tp_roles(model_size)
        # head-local attention additionally requires whole heads per
        # shard at the DECOUPLED head_dim — same predicate as llama's,
        # which super() already applied on (heads, kv_heads)
        return roles

    # -- gemma block deltas --------------------------------------------------
    def _stem(self, ids: Tensor, start=None) -> Tensor:
        # gemma scales embeddings by sqrt(dim).  On the quantized path
        # this is a PURE rescale of the tensor's grid: value =
        # (code - zp) * (scale * c) — exact, no code arithmetic.
        x = self.embed(ids)
        c = float(self.dim) ** 0.5
        if x.quantized:
            return Tensor(x.data, x.scale * c, x.zero_point)
        return Tensor(x.data * c)

    def _attn_out(self, i, o):
        return getattr(self, f"postn1_{i}")(o)

    def _mlp(self, i, x):
        h = getattr(self, f"ln2_{i}")(x)
        g = getattr(self, f"gelu{i}")(getattr(self, f"gate{i}")(h))
        m = getattr(self, f"mul{i}")(g, getattr(self, f"up{i}")(h))
        d = getattr(self, f"postn2_{i}")(getattr(self, f"down{i}")(m))
        return getattr(self, f"add2_{i}")(x, d)

    def forward(self, ids):
        out = super().forward(ids)
        # final logit softcap: tanh is monotone, so greedy argmax over
        # INT8 logit CODES is unchanged and the cap is skipped there
        # (generate()'s code-argmax stays exact); the FP32 path applies
        # it for torch parity.  Sampled INT8 logits are NOT capped —
        # documented limitation (cap before sampling would need a
        # dequant in the sampling epilogue).
        if not getattr(out, "quantized", False):
            data = out.data if isinstance(out, Tensor) else out
            c = jnp.float32(self.final_softcap)
            capped = c * jnp.tanh(data / c)
            return Tensor(capped) if isinstance(out, Tensor) else capped
        return out


def torch_gemma(vocab_size: int = 1000, max_len: int = 64,
                dim: int = 128, depth: int = 2, heads: int = 4,
                kv_heads: int | None = None, head_dim: int | None = None,
                mlp_hidden: int | None = None,
                rope_base: float = 10000.0,
                sliding_window: int | None = 32,
                attn_softcap: float = 50.0, final_softcap: float = 30.0,
                eps: float = 1e-6, seed: int = 42):
    """Matching torch oracle (same attribute names -> state_dict loads)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as tF

    torch.manual_seed(seed)
    kv = heads if kv_heads is None else kv_heads
    hd = (dim // heads) if head_dim is None else head_dim
    hidden = 4 * dim if mlp_hidden is None else mlp_hidden
    grp = heads // kv

    class RMSNorm(nn.Module):
        def __init__(self, d):
            super().__init__()
            self.weight = nn.Parameter(torch.zeros(d))  # unit offset

        def forward(self, x):
            ms = x.pow(2).mean(-1, keepdim=True)
            return x * torch.rsqrt(ms + eps) * (1.0 + self.weight)

    def rope(x, base, start=0):
        b, h, t, d = x.shape
        half = d // 2
        inv = base ** (-torch.arange(0, half, dtype=torch.float32)
                       / half)
        pos = torch.arange(start, start + t, dtype=torch.float32)
        ang = pos[:, None] * inv[None, :]
        cos, sin = torch.cos(ang), torch.sin(ang)
        x1, x2 = x[..., :half], x[..., half:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                         dim=-1)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Embedding(vocab_size, dim)
            for i in range(1, depth + 1):
                setattr(self, f"ln1_{i}", RMSNorm(dim))
                setattr(self, f"wq{i}", nn.Linear(dim, heads * hd,
                                                  bias=False))
                setattr(self, f"wk{i}", nn.Linear(dim, kv * hd,
                                                  bias=False))
                setattr(self, f"wv{i}", nn.Linear(dim, kv * hd,
                                                  bias=False))
                setattr(self, f"proj{i}", nn.Linear(heads * hd, dim,
                                                    bias=False))
                setattr(self, f"postn1_{i}", RMSNorm(dim))
                setattr(self, f"ln2_{i}", RMSNorm(dim))
                setattr(self, f"gate{i}", nn.Linear(dim, hidden,
                                                    bias=False))
                setattr(self, f"up{i}", nn.Linear(dim, hidden,
                                                  bias=False))
                setattr(self, f"down{i}", nn.Linear(hidden, dim,
                                                    bias=False))
                setattr(self, f"postn2_{i}", RMSNorm(dim))
            self.ln_f = RMSNorm(dim)
            self.head = nn.Linear(dim, vocab_size, bias=False)

        def forward(self, ids):
            x = self.embed(ids) * (dim ** 0.5)
            b, t, _ = x.shape
            for i in range(1, depth + 1):
                h = getattr(self, f"ln1_{i}")(x)
                q = getattr(self, f"wq{i}")(h).view(b, t, heads, hd
                                                    ).transpose(1, 2)
                k = getattr(self, f"wk{i}")(h).view(b, t, kv, hd
                                                    ).transpose(1, 2)
                v = getattr(self, f"wv{i}")(h).view(b, t, kv, hd
                                                    ).transpose(1, 2)
                q, k = rope(q, rope_base), rope(k, rope_base)
                k = k.repeat_interleave(grp, dim=1)
                v = v.repeat_interleave(grp, dim=1)
                s = (q @ k.transpose(-1, -2)) * (hd ** -0.5)
                s = attn_softcap * torch.tanh(s / attn_softcap)
                row = torch.arange(t)[:, None]
                col = torch.arange(t)[None, :]
                keep = col <= row
                if sliding_window is not None and i % 2 == 1:
                    keep = keep & (col > row - sliding_window)
                s = s.masked_fill(~keep, float("-inf"))
                o = tF.softmax(s, dim=-1) @ v
                o = o.transpose(1, 2).reshape(b, t, heads * hd)
                o = getattr(self, f"postn1_{i}")(
                    getattr(self, f"proj{i}")(o))
                x = x + o
                h = getattr(self, f"ln2_{i}")(x)
                g = tF.gelu(getattr(self, f"gate{i}")(h),
                            approximate="tanh")
                m = g * getattr(self, f"up{i}")(h)
                d = getattr(self, f"postn2_{i}")(
                    getattr(self, f"down{i}")(m))
                x = x + d
            logits = self.head(self.ln_f(x))
            return final_softcap * torch.tanh(logits / final_softcap)

    return Net()
