"""BloomDecoder: the BLOOM-family INT8 LM (ALiBi attention).

Not in the reference (its zoo is CNN-only; SURVEY.md §2.3).  What makes
the family distinct from the gpt/llama/neox stacks already here:

* **ALiBi instead of positional embeddings** (Press et al., ICLR'22):
  no learned/rotary positions anywhere — attention scores carry a
  per-head linear bias ``m_h * (col - row_position)``
  (``QuantSoftmax(alibi_heads=H)``; the decode fast path routes the
  bias through the XLA lowering, ops/attention.py).  The bias is a
  static function of ABSOLUTE positions, so the u8-KV-cache invariant
  (cached decode == full-forward recompute) holds unchanged, and the
  model extrapolates past its training length by construction.
* **Embedding LayerNorm** (``word_embeddings_layernorm``): a LayerNorm
  directly on the token embeddings before the first block — the
  ``_stem`` hook override (no ``pe`` table exists).
* **MHA + biased Linears + gelu MLP**, pre-LN — the gpt block
  otherwise, inherited from TextDecoder unchanged (flat u8 KV cache,
  generate(), serving engine, speculative decoding).

TP note: ALiBi slopes index GLOBAL query heads, so head-local TP is
disabled for this family (``tp_roles`` keeps row-parallel proj/fc2 and
column-parallel fc1 — the MQA-fallback plan); a head-local plan would
need per-shard slope slices threaded through the sharded decode.

HF ``transformer.word_embeddings*`` / ``h.N.self_attention.*`` naming
(fused per-head-interleaved ``query_key_value``, the NeoX layout) loads
via utils/hf.py.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, QuantConfig
from ..layers import (Linear, QuantAct, QuantAdd, QuantEmbed,
                      QuantLayerNorm, QuantMatmul, QuantSoftmax)
from ..module import Module
from .text_decoder import TextDecoder

__all__ = ["BloomDecoder", "torch_bloom"]


class BloomDecoder(TextDecoder):
    """BLOOM-family causal LM (bloom_tiny defaults: 128 dim / 2 blocks /
    4 heads, ALiBi attention, embedding LayerNorm)."""

    def __init__(self, vocab_size: int = 1000, max_len: int = 64,
                 dim: int = 128, depth: int = 2, heads: int = 4,
                 mlp_ratio: int = 4, eps: float = 1e-5,
                 config: QuantConfig = DEFAULT_CONFIG):
        Module.__init__(self, config)
        if dim % heads:
            raise ValueError(f"dim {dim} not divisible by heads {heads}")
        self.vocab_size, self.max_len = vocab_size, max_len
        self.dim, self.depth, self.heads = dim, depth, heads
        self.kv_heads = heads                    # MHA
        self.head_dim = dim // heads
        self.mlp_hidden = mlp_ratio * dim
        self.act = "gelu"
        self.sliding_window = None
        self.ring_cache = False
        self.INPUT_SHAPE = (max_len,)
        self.embed = QuantEmbed(vocab_size, dim, config=config)
        self.embed_ln = QuantLayerNorm(dim, eps, config=config)
        for i in range(1, depth + 1):
            setattr(self, f"ln1_{i}", QuantLayerNorm(dim, eps,
                                                     config=config))
            for w in ("wq", "wk", "wv"):
                setattr(self, f"{w}{i}", Linear(dim, dim, config=config))
            setattr(self, f"attn{i}", QuantMatmul(
                alpha=self.head_dim ** -0.5, transpose_b=True,
                config=config))
            setattr(self, f"smax{i}", QuantSoftmax(
                config=config, causal=True, alibi_heads=heads))
            setattr(self, f"av{i}", QuantMatmul(config=config))
            setattr(self, f"proj{i}", Linear(dim, dim, config=config))
            setattr(self, f"add1_{i}", QuantAdd(config=config))
            setattr(self, f"ln2_{i}", QuantLayerNorm(dim, eps,
                                                     config=config))
            setattr(self, f"fc1_{i}", Linear(dim, self.mlp_hidden,
                                             config=config))
            setattr(self, f"gelu{i}", QuantAct("gelu", config=config))
            setattr(self, f"fc2_{i}", Linear(self.mlp_hidden, dim,
                                             config=config))
            setattr(self, f"add2_{i}", QuantAdd(config=config))
        self.ln_f = QuantLayerNorm(dim, eps, config=config)
        self.head = Linear(dim, vocab_size, config=config)

    def _stem(self, ids, start=None):
        # no positional table: ALiBi carries position in the scores;
        # ``start`` is therefore unused (absolute positions enter via
        # each attention's valid_len)
        return self.embed_ln(self.embed(ids))

    def tp_roles(self, model_size: int) -> dict:
        # no head-local attention: ALiBi slopes index GLOBAL heads (see
        # module docstring) — qkv stay replicated, MLP still shards
        roles = {}
        for i in range(1, self.depth + 1):
            roles[f"proj{i}"] = "row"
            roles[f"fc1_{i}"] = "col_local"
            roles[f"fc2_{i}"] = "row"
        return roles


def torch_bloom(vocab_size: int = 1000, max_len: int = 64, dim: int = 128,
                depth: int = 2, heads: int = 4, mlp_ratio: int = 4,
                eps: float = 1e-5, seed: int = 42):
    """FP32 torch twin of BloomDecoder (HF Bloom math: ALiBi biases,
    embedding LayerNorm, erf gelu), attribute-name-compatible with
    ``BloomDecoder.load``."""
    import torch
    import torch.nn as nn

    from ..layers import alibi_slopes

    torch.manual_seed(seed)
    slopes = torch.tensor(alibi_slopes(heads), dtype=torch.float32)

    class _Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Embedding(vocab_size, dim)
            self.embed_ln = nn.LayerNorm(dim, eps=eps)
            for i in range(1, depth + 1):
                setattr(self, f"ln1_{i}", nn.LayerNorm(dim, eps=eps))
                for w in ("wq", "wk", "wv"):
                    setattr(self, f"{w}{i}", nn.Linear(dim, dim))
                setattr(self, f"proj{i}", nn.Linear(dim, dim))
                setattr(self, f"ln2_{i}", nn.LayerNorm(dim, eps=eps))
                setattr(self, f"fc1_{i}", nn.Linear(dim, mlp_ratio * dim))
                setattr(self, f"fc2_{i}", nn.Linear(mlp_ratio * dim, dim))
            self.ln_f = nn.LayerNorm(dim, eps=eps)
            self.head = nn.Linear(dim, vocab_size)

        def forward(self, ids):
            b, t = ids.shape
            hd = dim // heads
            x = self.embed_ln(self.embed(ids))
            row = torch.arange(t)[:, None]
            col = torch.arange(t)[None, :]
            mask = torch.where(col <= row, 0.0, float("-inf"))
            bias = slopes.view(heads, 1, 1) * (col - row).float()
            for i in range(1, depth + 1):
                h = getattr(self, f"ln1_{i}")(x)
                sp = (lambda y: y.view(b, t, heads, hd)
                      .transpose(1, 2))
                q = sp(getattr(self, f"wq{i}")(h))
                k = sp(getattr(self, f"wk{i}")(h))
                v = sp(getattr(self, f"wv{i}")(h))
                s = q @ k.transpose(-1, -2) * hd ** -0.5 + bias + mask
                p = torch.softmax(s, dim=-1)
                o = (p @ v).transpose(1, 2).reshape(b, t, dim)
                x = x + getattr(self, f"proj{i}")(o)
                m = getattr(self, f"fc2_{i}")(
                    torch.nn.functional.gelu(
                        getattr(self, f"fc1_{i}")(
                            getattr(self, f"ln2_{i}")(x))))
                x = x + m
            return self.head(self.ln_f(x))

    return _Net().eval()
