"""ViT: INT8 Vision Transformer — the framework generalizes beyond CNNs.

Far beyond the reference zoo (SURVEY.md §2.3 is CNN-only): attention needs
quantized activation x activation GEMMs (``QuantMatmul`` — both operands'
zero-point corrections are data-dependent, unlike every reference GEMM),
calibrated softmax over scores, LayerNorm between int8 GEMMs, and the
cls-token/pos-embed stem (``QuantPosEmbed``).  The MLP half reuses Linear +
``QuantAct("gelu")``.  The patch stem is the existing Conv2d (k=p, s=p —
which the conv lowering rewrites space-to-depth into a pure GEMM).

Per-tensor PTQ of transformers is known to be harder than CNNs (GELU/
softmax outputs are heavy-tailed); the differential tests assert argmax
agreement rather than tight logit error, like the reference's own
statistical integration test (unittest/test_quantized_layer.py:59-61).

Flat attribute naming, hand-written torch twin, BN-free as usual.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, QuantConfig
from ..layers import (Conv2d, Linear, QuantAct, QuantAdd, QuantLayerNorm,
                      QuantMatmul, QuantPosEmbed, QuantSoftmax,
                      fused_attention, fused_linear_act, fused_qkv)
from ..module import Module
from ..ops import functional as F

__all__ = ["ViT", "torch_vit"]


class ViT(Module):
    """Vision Transformer (ViT-Tiny defaults: 192 dim / 12 blocks / 3 heads).

    Per block i: ``ln1_{i}`` -> ``wq{i}``/``wk{i}``/``wv{i}`` -> heads ->
    ``attn{i}`` (QK^T, alpha=1/sqrt(d)) -> ``smax{i}`` -> ``av{i}`` (P@V)
    -> ``proj{i}`` -> ``add1_{i}`` residual; then ``ln2_{i}`` ->
    ``fc1_{i}`` -> ``gelu{i}`` -> ``fc2_{i}`` -> ``add2_{i}``.
    Head: ``ln_f`` -> cls token -> ``head``.
    """

    def __init__(self, img_size: int = 224, patch: int = 16, dim: int = 192,
                 depth: int = 12, heads: int = 3, mlp_ratio: int = 4,
                 num_classes: int = 10,
                 config: QuantConfig = DEFAULT_CONFIG):
        super().__init__(config)
        if img_size % patch:
            raise ValueError(f"img_size {img_size} not divisible by "
                             f"patch {patch}")
        if dim % heads:
            raise ValueError(f"dim {dim} not divisible by heads {heads}")
        self.INPUT_SHAPE = (3, img_size, img_size)
        self.dim, self.depth, self.heads = dim, depth, heads
        t = (img_size // patch) ** 2
        self.patch = Conv2d(3, dim, patch, stride=patch, config=config)
        self.pe = QuantPosEmbed(t, dim, config=config)
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

    def tp_roles(self, model_size: int) -> dict:
        """Megatron-style transformer TP plan (see TextDecoder.tp_roles).
        ViT-Tiny's 3 heads don't divide a 2-way model axis — then QKV
        stay plain column-parallel (gathered) and attention runs on full
        heads, while proj/fc1/fc2 still shard."""
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

    def forward(self, x):
        x = F.to_tokens(self.patch(x))
        x = self.pe(x)
        # 2D-resident blocks: every pointwise layer (LN / Linear / add /
        # gelu) runs on the flat [B*T, C] view — on TPU the tiled layout of
        # a [B, T, C] tensor pads T, so each 3D<->2D reshape is a real
        # repack (~35 us on ViT-Tiny b128, x96 = 3.4 ms of the profile).
        # Only the attention head split/merge touches 3D.
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
            # -1 widths: under head-parallel TP the projections keep their
            # LOCAL channel shard (c / model_size) instead of gathering
            qh = F.split_heads(q2.reshape(b, t, -1), self.heads)
            kh = F.split_heads(k2.reshape(b, t, -1), self.heads)
            vh = F.split_heads(v2.reshape(b, t, -1), self.heads)
            attn = getattr(self, f"attn{i}")
            if attn.is_quantized and qh.quantized and not qh._tp_sharded \
                    and self.config.fused_attention != "off":
                o = fused_attention(attn, getattr(self, f"smax{i}"),
                                    getattr(self, f"av{i}"), qh, kh, vh)
            else:
                s = attn(qh, kh)
                p = getattr(self, f"smax{i}")(s)
                o = getattr(self, f"av{i}")(p, vh)
            o = F.merge_heads(o)
            o = o.reshape(b * t, o.shape[-1])
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


def torch_vit(img_size: int = 224, patch: int = 16, dim: int = 192,
              depth: int = 12, heads: int = 3, mlp_ratio: int = 4,
              num_classes: int = 10, seed: int = 42):
    """Matching torch oracle (same attribute names -> state_dict loads).

    The cls token / positional table live in a parameter holder named
    ``pe`` with fields ``weight`` ([T+1, C] pos table) and ``bias``
    ([C] cls token) so the flat 'name.weight'/'name.bias' state_dict
    convention covers them.
    """
    import torch
    import torch.nn as nn
    import torch.nn.functional as tF

    torch.manual_seed(seed)
    t = (img_size // patch) ** 2
    hd = dim // heads

    class PE(nn.Module):
        def __init__(self):
            super().__init__()
            self.weight = nn.Parameter(torch.randn(t + 1, dim) * 0.02)
            self.bias = nn.Parameter(torch.randn(dim) * 0.02)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch = nn.Conv2d(3, dim, patch, stride=patch)
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

        def forward(self, x):
            b = x.shape[0]
            x = self.patch(x).flatten(2).transpose(1, 2)   # [B, T, C]
            cls = self.pe.bias.reshape(1, 1, dim).expand(b, 1, dim)
            x = torch.cat([cls, x], dim=1) + self.pe.weight
            for i in range(1, depth + 1):
                h = getattr(self, f"ln1_{i}")(x)

                def heads_of(z):
                    return (z.reshape(b, -1, heads, hd)
                            .transpose(1, 2))
                q = heads_of(getattr(self, f"wq{i}")(h))
                k = heads_of(getattr(self, f"wk{i}")(h))
                v = heads_of(getattr(self, f"wv{i}")(h))
                s = (q @ k.transpose(-1, -2)) * hd ** -0.5
                p = tF.softmax(s, dim=-1)
                o = (p @ v).transpose(1, 2).reshape(b, -1, dim)
                x = x + getattr(self, f"proj{i}")(o)
                h = getattr(self, f"ln2_{i}")(x)
                h = getattr(self, f"fc2_{i}")(
                    tF.gelu(getattr(self, f"fc1_{i}")(h)))
                x = x + h
            x = self.ln_f(x)
            return self.head(x[:, 0, :])

    return Net()
