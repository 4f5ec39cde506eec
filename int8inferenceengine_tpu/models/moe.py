"""MoEDecoder: the mixture-of-experts llama-family INT8 LM (mixtral-ish).

Not in the reference (CNN-only; SURVEY.md §2.3) — this swaps the llama
block's dense SwiGLU MLP for a top-k routed expert MLP
(layers.QuantMoE: stacked [E, ...] expert weights, FP32 router, dynamic
W8A8 expert GEMMs, one calibrated output grid — design notes on the
layer).  Everything else — RMSNorm/RoPE/GQA kv-compact decode, the flat
decode-attention kernel, generate()/speculative decoding, the serving
engine — is inherited from LlamaDecoder unchanged, because the MLP is
positionwise: the cached-decode == full-forward invariant is untouched.

Parallelism: ``tp_roles`` maps each ``moe{i}`` to the 'expert' role —
EXPERT parallelism over the model mesh axis (each device holds
E/model_size whole experts, computes them densely over all tokens, and
one psum combines partial outputs; bit-exact for top_k <= 2).  Attention
stays head-local column/row-parallel as in the llama plan, so a single
(data, model) mesh carries DP x (TP attention + EP experts).
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, QuantConfig
from ..layers import QuantMoE
from .llama import LlamaDecoder, swiglu_hidden

__all__ = ["MoEDecoder", "torch_moe"]


class MoEDecoder(LlamaDecoder):
    """llama block body with a top-k MoE MLP (moe_tiny defaults: 128 dim
    / 2 blocks / 4 heads over 2 kv / 4 experts, top-2)."""

    def __init__(self, vocab_size: int = 1000, max_len: int = 64,
                 dim: int = 128, depth: int = 2, heads: int = 4,
                 kv_heads: int | None = None, mlp_hidden: int | None = None,
                 n_experts: int = 4, top_k: int = 2,
                 rope_base: float = 10000.0, eps: float = 1e-6,
                 config: QuantConfig = DEFAULT_CONFIG,
                 dispatch: str = "auto"):
        super().__init__(vocab_size=vocab_size, max_len=max_len, dim=dim,
                         depth=depth, heads=heads, kv_heads=kv_heads,
                         mlp_hidden=mlp_hidden, rope_base=rope_base,
                         eps=eps, config=config)
        self.n_experts, self.top_k = int(n_experts), int(top_k)
        for i in range(1, depth + 1):
            # the dense SwiGLU stack is replaced wholesale by one MoE
            for nm in ("gate", "silu", "up", "mul", "down"):
                delattr(self, f"{nm}{i}")
            setattr(self, f"moe{i}", QuantMoE(
                dim, self.mlp_hidden, n_experts, top_k, config=config,
                dispatch=dispatch))

    def tp_roles(self, model_size: int) -> dict:
        roles = super().tp_roles(model_size)
        for i in range(1, self.depth + 1):
            for nm in ("gate", "up", "down"):
                roles.pop(f"{nm}{i}", None)
            roles[f"moe{i}"] = "expert"
        return roles

    def _mlp(self, i, x):
        h = getattr(self, f"ln2_{i}")(x)
        return getattr(self, f"add2_{i}")(x, getattr(self, f"moe{i}")(h))


def torch_moe(vocab_size: int = 1000, max_len: int = 64, dim: int = 128,
              depth: int = 2, heads: int = 4, kv_heads: int | None = None,
              mlp_hidden: int | None = None, n_experts: int = 4,
              top_k: int = 2, rope_base: float = 10000.0,
              eps: float = 1e-6, seed: int = 42):
    """Matching torch oracle (stacked expert parameters named gate_w /
    up_w / down_w / router so ``state_dict`` keys load via
    Module.load's ``load_<param>`` dispatch)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as tF

    from .llama import torch_llama

    torch.manual_seed(seed)
    hidden = swiglu_hidden(dim) if mlp_hidden is None else mlp_hidden

    class MoE(nn.Module):
        def __init__(self):
            super().__init__()
            self.router = nn.Parameter(torch.randn(n_experts, dim) * 0.05)
            self.gate_w = nn.Parameter(
                torch.randn(n_experts, hidden, dim) * dim ** -0.5)
            self.up_w = nn.Parameter(
                torch.randn(n_experts, hidden, dim) * dim ** -0.5)
            self.down_w = nn.Parameter(
                torch.randn(n_experts, dim, hidden) * hidden ** -0.5)

        def forward(self, h):                        # [..., K]
            shp = h.shape
            f = h.reshape(-1, shp[-1])
            logits = f @ self.router.T               # [M, E]
            kth = torch.topk(logits, top_k, dim=-1).values[..., -1:]
            w = torch.softmax(
                logits.masked_fill(logits < kth, float("-inf")), dim=-1)
            g = torch.einsum("mk,ehk->meh", f, self.gate_w)
            u = torch.einsum("mk,ehk->meh", f, self.up_w)
            d = torch.einsum("meh,ekh->mek", tF.silu(g) * u, self.down_w)
            out = (d * w[:, :, None]).sum(dim=1)
            return out.reshape(shp)

    net = torch_llama(vocab_size=vocab_size, max_len=max_len, dim=dim,
                      depth=depth, heads=heads, kv_heads=kv_heads,
                      mlp_hidden=mlp_hidden, rope_base=rope_base,
                      eps=eps, seed=seed)
    # swap the dense MLPs for MoE modules (the llama twin's forward
    # closes over getattr names, so replace attribute-compatibly)
    torch.manual_seed(seed + 1)
    for i in range(1, depth + 1):
        for nm in ("gate", "up", "down"):
            delattr(net, f"{nm}{i}")
        setattr(net, f"moe{i}", MoE())

    # rebind forward: the llama twin's forward references gate/up/down —
    # define the MoE-block forward here instead
    import types

    def forward(self, ids):
        import torch as _t
        b, t = ids.shape
        x = self.embed(ids)
        mask = _t.triu(_t.full((t, t), float("-inf")), 1)
        hd = dim // heads
        half = hd // 2
        inv = rope_base ** (-_t.arange(half, dtype=_t.float32) * (2.0 / hd))
        ang = _t.arange(t, dtype=_t.float32)[:, None] * inv
        cos, sin = _t.cos(ang), _t.sin(ang)
        kv = heads if kv_heads is None else kv_heads
        grp = heads // kv

        def rot(z):
            z1, z2 = z[..., :half], z[..., half:]
            return _t.cat([z1 * cos - z2 * sin, z2 * cos + z1 * sin], -1)

        def heads_of(z, n):
            return z.reshape(b, -1, n, hd).transpose(1, 2)

        for i in range(1, depth + 1):
            h = getattr(self, f"ln1_{i}")(x)
            qh = rot(heads_of(getattr(self, f"wq{i}")(h), heads))
            kh = rot(heads_of(getattr(self, f"wk{i}")(h), kv))
            vh = heads_of(getattr(self, f"wv{i}")(h), kv)
            kh = kh.repeat_interleave(grp, dim=1)
            vh = vh.repeat_interleave(grp, dim=1)
            s = (qh @ kh.transpose(-1, -2)) * hd ** -0.5 + mask
            p = _t.softmax(s, dim=-1)
            o = (p @ vh).transpose(1, 2).reshape(b, -1, dim)
            x = x + getattr(self, f"proj{i}")(o)
            h = getattr(self, f"ln2_{i}")(x)
            x = x + getattr(self, f"moe{i}")(h)
        return self.head(self.ln_f(x))

    net.forward = types.MethodType(forward, net)
    return net
