"""NeoXDecoder: the GPT-NeoX / Pythia-family INT8 LM.

Not in the reference (its only model family is CNNs; SURVEY.md §2.3) —
this family (GPT-NeoX-20B, the Pythia suite, and the phi line's block
topology) differs from both the GPT and llama families already here:

* **Parallel residual** (``use_parallel_residual=True``, the NeoX
  default): attention and the MLP both read the SAME input hidden
  state — ``x + attn(ln1(x)) + mlp(ln2(x))`` — instead of the MLP
  consuming the post-attention residual.  Implemented as the
  ``_residual`` hook override on the shared llama block machinery
  (models/llama.py), so prefill, cached decode, and multi-token
  extends all get it from one place; ``use_parallel_residual=False``
  falls back to the inherited sequential tail (some small pythia
  checkpoints ship that way).
* **Partial rotary** (``rotary_pct``, NeoX default 0.25): only the
  first ``head_dim * rotary_pct`` channels of each head rotate; the
  rest pass through (``QuantRoPE(rotary_dim=)``).  Angles stay a
  static function of position, so the u8-KV-cache bit-exactness
  invariant (cached decode == full-forward recompute) is untouched.
* **Biased projections + LayerNorm**: qkv/dense carry biases and the
  norms are standard LayerNorm with bias (``QuantLayerNorm``), unlike
  llama's bias-free RMSNorm stack.
* **MHA with a gelu MLP**: kv_heads == heads (the flat cache is simply
  head-complete), fc1 -> gelu -> fc2 with the fused Linear+gelu
  epilogue.

Everything else — T-major flat u8 KV cache, the merged decode kernel,
one-jitted-program generate(), speculative decoding, the serving
engine, TP generate — is inherited unchanged through LlamaDecoder's
hooks.  HF ``gpt_neox.*`` checkpoint naming (fused per-head-interleaved
``query_key_value``) loads via utils/hf.py.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, QuantConfig
from ..layers import (Linear, QuantAct, QuantAdd, QuantEmbed,
                      QuantLayerNorm, QuantMatmul, QuantRoPE,
                      QuantSoftmax, fused_linear_act)
from ..module import Module
from .llama import LlamaDecoder

__all__ = ["NeoXDecoder", "torch_neox"]


class NeoXDecoder(LlamaDecoder):
    """GPT-NeoX-family causal LM (neox_tiny defaults: 128 dim /
    2 blocks / 4 heads, rotary_pct 0.25, parallel residual)."""

    def __init__(self, vocab_size: int = 1000, max_len: int = 64,
                 dim: int = 128, depth: int = 2, heads: int = 4,
                 mlp_ratio: int = 4, rotary_pct: float = 0.25,
                 rope_base: float = 10000.0,
                 use_parallel_residual: bool = True,
                 eps: float = 1e-5,
                 config: QuantConfig = DEFAULT_CONFIG):
        Module.__init__(self, config)
        if dim % heads:
            raise ValueError(f"dim {dim} not divisible by heads {heads}")
        self.vocab_size, self.max_len = vocab_size, max_len
        self.dim, self.depth, self.heads = dim, depth, heads
        self.kv_heads = heads                    # MHA
        self.head_dim = dim // heads
        self.mlp_hidden = mlp_ratio * dim
        self.sliding_window = None
        self.ring_cache = False
        self.parallel_residual = bool(use_parallel_residual)
        rotary_dim = int(self.head_dim * float(rotary_pct))
        if rotary_dim % 2:
            raise ValueError(
                f"head_dim {self.head_dim} * rotary_pct {rotary_pct} "
                f"gives odd rotary_dim {rotary_dim}")
        self.rotary_dim = rotary_dim
        self.eps = float(eps)
        self.INPUT_SHAPE = (max_len,)
        self.embed = QuantEmbed(vocab_size, dim, config=config)
        for i in range(1, depth + 1):
            setattr(self, f"ln1_{i}", QuantLayerNorm(dim, eps, config=config))
            for w in ("wq", "wk", "wv"):
                setattr(self, f"{w}{i}", Linear(dim, dim, config=config))
            for r in ("rq", "rk"):
                setattr(self, f"{r}{i}", QuantRoPE(
                    self.head_dim, rope_base, config=config,
                    rotary_dim=rotary_dim))
            setattr(self, f"attn{i}", QuantMatmul(
                alpha=self.head_dim ** -0.5, transpose_b=True,
                config=config))
            setattr(self, f"smax{i}", QuantSoftmax(config=config,
                                                   causal=True))
            setattr(self, f"av{i}", QuantMatmul(config=config))
            setattr(self, f"proj{i}", Linear(dim, dim, config=config))
            setattr(self, f"add1_{i}", QuantAdd(config=config))
            setattr(self, f"ln2_{i}", QuantLayerNorm(dim, eps, config=config))
            setattr(self, f"fc1_{i}", Linear(dim, self.mlp_hidden,
                                             config=config))
            setattr(self, f"gelu{i}", QuantAct("gelu", config=config))
            setattr(self, f"fc2_{i}", Linear(self.mlp_hidden, dim,
                                             config=config))
            setattr(self, f"add2_{i}", QuantAdd(config=config))
        self.ln_f = QuantLayerNorm(dim, eps, config=config)
        self.head = Linear(dim, vocab_size, config=config)

    def tp_roles(self, model_size: int) -> dict:
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

    def _mlp_out(self, i, x):
        """fc1 -> gelu -> fc2 WITHOUT the residual add (the parallel
        form adds once, after attention and MLP both computed)."""
        h = getattr(self, f"ln2_{i}")(x)
        fc1, gelu = getattr(self, f"fc1_{i}"), getattr(self, f"gelu{i}")
        if fc1.is_quantized and self.config.fuse_linear_act:
            h = fused_linear_act(fc1, gelu, h)
        else:
            h = gelu(fc1(h))
        return getattr(self, f"fc2_{i}")(h)

    def _mlp(self, i, x):
        # the sequential fallback (use_parallel_residual=False) rides
        # the inherited _residual through this
        return getattr(self, f"add2_{i}")(x, self._mlp_out(i, x))

    def _residual(self, i, x, o):
        if not self.parallel_residual:
            return super()._residual(i, x, o)
        # x + attn(ln1 x) + mlp(ln2 x): the MLP reads the block INPUT
        m = self._mlp_out(i, x)
        return getattr(self, f"add2_{i}")(
            getattr(self, f"add1_{i}")(x, o), m)


def torch_neox(vocab_size: int = 1000, max_len: int = 64, dim: int = 128,
               depth: int = 2, heads: int = 4, mlp_ratio: int = 4,
               rotary_pct: float = 0.25, rope_base: float = 10000.0,
               use_parallel_residual: bool = True, eps: float = 1e-5,
               seed: int = 42):
    """FP32 torch twin of NeoXDecoder (HF GPTNeoX math: parallel
    residual, partial rotary with the half-split pair layout, erf
    gelu), attribute-name-compatible with ``NeoXDecoder.load``."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)

    class _RoPE(nn.Module):
        def __init__(self, head_dim, rotary_dim, base):
            super().__init__()
            self.hd, self.r, self.base = head_dim, rotary_dim, base

        def forward(self, x, start=0):
            # x [B, H, T, D]; rotate the first r channels
            r = self.r
            t = x.shape[-2]
            pos = torch.arange(start, start + t, dtype=torch.float32)
            inv = self.base ** (
                -torch.arange(0, r, 2, dtype=torch.float32) / r)
            ang = pos[:, None] * inv[None, :]           # [T, r/2]
            cos, sin = torch.cos(ang), torch.sin(ang)
            x1, x2 = x[..., : r // 2], x[..., r // 2: r]
            rot = torch.cat([x1 * cos - x2 * sin,
                             x2 * cos + x1 * sin], dim=-1)
            return torch.cat([rot, x[..., r:]], dim=-1)

    class _Net(nn.Module):
        def __init__(self):
            super().__init__()
            hd = dim // heads
            rd = int(hd * rotary_pct)
            self.embed = nn.Embedding(vocab_size, dim)
            for i in range(1, depth + 1):
                setattr(self, f"ln1_{i}", nn.LayerNorm(dim, eps=eps))
                for w in ("wq", "wk", "wv"):
                    setattr(self, f"{w}{i}", nn.Linear(dim, dim))
                setattr(self, f"rope{i}", _RoPE(hd, rd, rope_base))
                setattr(self, f"proj{i}", nn.Linear(dim, dim))
                setattr(self, f"ln2_{i}", nn.LayerNorm(dim, eps=eps))
                setattr(self, f"fc1_{i}", nn.Linear(dim, mlp_ratio * dim))
                setattr(self, f"fc2_{i}", nn.Linear(mlp_ratio * dim, dim))
            self.ln_f = nn.LayerNorm(dim, eps=eps)
            self.head = nn.Linear(dim, vocab_size)

        def forward(self, ids):
            b, t = ids.shape
            hd = dim // heads
            x = self.embed(ids)
            mask = torch.triu(
                torch.full((t, t), float("-inf")), diagonal=1)
            for i in range(1, depth + 1):
                h = getattr(self, f"ln1_{i}")(x)
                sp = (lambda y: y.view(b, t, heads, hd)
                      .transpose(1, 2))
                q = sp(getattr(self, f"wq{i}")(h))
                k = sp(getattr(self, f"wk{i}")(h))
                v = sp(getattr(self, f"wv{i}")(h))
                rope = getattr(self, f"rope{i}")
                q, k = rope(q), rope(k)
                s = q @ k.transpose(-1, -2) * hd ** -0.5 + mask
                p = torch.softmax(s, dim=-1)
                o = (p @ v).transpose(1, 2).reshape(b, t, dim)
                a = getattr(self, f"proj{i}")(o)
                m = getattr(self, f"fc2_{i}")(torch.nn.functional.gelu(
                    getattr(self, f"fc1_{i}")(
                        getattr(self, f"ln2_{i}")(
                            x if use_parallel_residual
                            else x + a))))
                x = x + a + m
            return self.head(self.ln_f(x))

    return _Net().eval()
