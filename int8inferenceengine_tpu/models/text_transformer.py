"""TextTransformer: BERT-style INT8 text-classification encoder.

Demonstrates the framework's transformer primitives on an NLP workload
(far beyond the image-only reference, SURVEY.md §2.3): ``QuantEmbed``
(pre-quantized u8 token table, pure-gather INT8 stem), the shared
``QuantPosEmbed`` cls+positions stem glue, and the same attention/MLP
block structure as models/vit.py.  Token ids flow in raw (the Module
skips input quantization for id-consuming models).

Flat attribute naming, hand-written torch twin as usual.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, QuantConfig
from ..layers import (Linear, QuantAct, QuantAdd, QuantEmbed, QuantLayerNorm,
                      QuantMatmul, QuantPosEmbed, QuantSoftmax,
                      fused_attention, fused_linear_act, fused_qkv)
from ..module import Module
from ..ops import functional as F

__all__ = ["TextTransformer", "torch_text_transformer"]


class TextTransformer(Module):
    """Encoder-only classifier: embed -> cls+pos -> N blocks -> cls head."""

    def __init__(self, vocab_size: int = 1000, max_len: int = 64,
                 dim: int = 128, depth: int = 2, heads: int = 2,
                 mlp_ratio: int = 4, num_classes: int = 10,
                 config: QuantConfig = DEFAULT_CONFIG):
        super().__init__(config)
        if dim % heads:
            raise ValueError(f"dim {dim} not divisible by heads {heads}")
        self.INPUT_SHAPE = (max_len,)
        self.dim, self.depth, self.heads = dim, depth, heads
        self.max_len = max_len
        self.embed = QuantEmbed(vocab_size, dim, config=config)
        self.pe = QuantPosEmbed(max_len, dim, config=config)
        hd = dim // heads
        for i in range(1, depth + 1):
            setattr(self, f"ln1_{i}", QuantLayerNorm(dim, config=config))
            for w in ("wq", "wk", "wv"):
                setattr(self, f"{w}{i}", Linear(dim, dim, config=config))
            setattr(self, f"attn{i}", QuantMatmul(
                alpha=hd ** -0.5, transpose_b=True, config=config))
            setattr(self, f"smax{i}", QuantSoftmax(config=config))
            setattr(self, f"av{i}", QuantMatmul(config=config))
            setattr(self, f"proj{i}", Linear(dim, dim, config=config))
            setattr(self, f"add1_{i}", QuantAdd(config=config))
            setattr(self, f"ln2_{i}", QuantLayerNorm(dim, config=config))
            setattr(self, f"fc1_{i}", Linear(dim, mlp_ratio * dim,
                                             config=config))
            setattr(self, f"gelu{i}", QuantAct("gelu", config=config))
            setattr(self, f"fc2_{i}", Linear(mlp_ratio * dim, dim,
                                             config=config))
            setattr(self, f"add2_{i}", QuantAdd(config=config))
        self.ln_f = QuantLayerNorm(dim, config=config)
        self.head = Linear(dim, num_classes, config=config)

    def forward(self, ids):
        x = self.embed(ids)                      # [B, T, D]
        x = self.pe(x)                           # [B, T+1, D] (cls at 0)
        # 2D-resident blocks (see models/vit.py): pointwise layers run on
        # the flat [B*T, C] view; only head split/merge touches 3D.
        b, t, c = x.shape
        x = x.reshape(b * t, c)
        for i in range(1, self.depth + 1):
            h = getattr(self, f"ln1_{i}")(x)
            if self.config.fuse_qkv != "off":
                q2, k2, v2 = fused_qkv(getattr(self, f"wq{i}"),
                                       getattr(self, f"wk{i}"),
                                       getattr(self, f"wv{i}"), h)
            else:
                q2 = getattr(self, f"wq{i}")(h)
                k2 = getattr(self, f"wk{i}")(h)
                v2 = getattr(self, f"wv{i}")(h)
            qh = F.split_heads(q2.reshape(b, t, c), self.heads)
            kh = F.split_heads(k2.reshape(b, t, c), self.heads)
            vh = F.split_heads(v2.reshape(b, t, c), self.heads)
            attn = getattr(self, f"attn{i}")
            if attn.is_quantized and qh.quantized \
                    and self.config.fused_attention != "off":
                o = fused_attention(attn, getattr(self, f"smax{i}"),
                                    getattr(self, f"av{i}"), qh, kh, vh)
            else:
                s = attn(qh, kh)
                p = getattr(self, f"smax{i}")(s)
                o = getattr(self, f"av{i}")(p, vh)
            o = F.merge_heads(o).reshape(b * t, c)
            o = getattr(self, f"proj{i}")(o)
            x = getattr(self, f"add1_{i}")(x, o)
            h = getattr(self, f"ln2_{i}")(x)
            fc1, gelu = getattr(self, f"fc1_{i}"), getattr(self, f"gelu{i}")
            if fc1.is_quantized and self.config.fuse_linear_act:
                h = fused_linear_act(fc1, gelu, h)
            else:
                h = gelu(fc1(h))
            h = getattr(self, f"fc2_{i}")(h)
            x = getattr(self, f"add2_{i}")(x, h)
        x = self.ln_f(x)
        x = F.select_token(x.reshape(b, t, c), 0)
        return self.head(x)


def torch_text_transformer(vocab_size: int = 1000, max_len: int = 64,
                           dim: int = 128, depth: int = 2, heads: int = 2,
                           mlp_ratio: int = 4, num_classes: int = 10,
                           seed: int = 42):
    """Matching torch oracle (same attribute names -> state_dict loads)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as tF

    torch.manual_seed(seed)
    hd = dim // heads

    class PE(nn.Module):
        def __init__(self):
            super().__init__()
            self.weight = nn.Parameter(torch.randn(max_len + 1, dim) * 0.02)
            self.bias = nn.Parameter(torch.randn(dim) * 0.02)

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
            self.head = nn.Linear(dim, num_classes)

        def forward(self, ids):
            b = ids.shape[0]
            x = self.embed(ids.long())
            cls = self.pe.bias.reshape(1, 1, dim).expand(b, 1, dim)
            x = torch.cat([cls, x], dim=1) + self.pe.weight
            for i in range(1, depth + 1):
                h = getattr(self, f"ln1_{i}")(x)

                def heads_of(z):
                    return z.reshape(b, -1, heads, hd).transpose(1, 2)
                qh = heads_of(getattr(self, f"wq{i}")(h))
                kh = heads_of(getattr(self, f"wk{i}")(h))
                vh = heads_of(getattr(self, f"wv{i}")(h))
                s = (qh @ kh.transpose(-1, -2)) * hd ** -0.5
                p = tF.softmax(s, dim=-1)
                o = (p @ vh).transpose(1, 2).reshape(b, -1, dim)
                x = x + getattr(self, f"proj{i}")(o)
                h = getattr(self, f"ln2_{i}")(x)
                x = x + getattr(self, f"fc2_{i}")(
                    tF.gelu(getattr(self, f"fc1_{i}")(h)))
            x = self.ln_f(x)
            return self.head(x[:, 0, :])

    return Net()
