"""SmoothQuant-style activation smoothing (Xiao et al., ICML 2023).

Per-tensor activation quantization of transformers is limited by a few
outlier CHANNELS after LayerNorm: one hot channel inflates the whole
tensor's scale and starves every other channel of codes.  Smoothing
migrates that difficulty into the weights, where per-channel structure is
cheap: for each LayerNorm -> Linear(s) boundary pick a per-channel factor

    s_j = amax_j(|X|)^alpha / max_j(|W|)^(1-alpha)        (alpha ~ 0.5)

and rewrite  X W^T = (X / s) (W * s)^T:  fold ``1/s`` into the LN's
gamma/beta (they stay FP32 in this engine — the fold is exact, no extra
runtime op) and ``s`` into each consumer Linear's columns.  FP32 output is
invariant; the INT8 activation grid after the LN now covers a balanced
range.

Like cross-layer equalization (utils/equalize.py) this runs BEFORE
``prepare()``'s calibration (the calibrator must see the smoothed ranges);
unlike CLE it is data-driven — the per-channel activation maxima come from
a tapped forward over a calibration batch (layers._INPUT_TAP).

    net.load(...)
    utils.smooth(net, utils.transformer_smooth_pairs(net), x_calib)
    net.prepare(); net(q.tensor(x_calib)); net.convert()
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..layers import _INPUT_TAP, Linear, QuantLayerNorm, QuantRMSNorm
from ..tensor import Tensor

__all__ = ["smooth", "transformer_smooth_pairs"]


def transformer_smooth_pairs(net) -> list:
    """The norm -> Linear boundaries of this package's transformer models.

    ViT / TextTransformer / TextDecoder share the gpt block naming
    (ln2 -> fc1); the llama family's ln2 feeds the SwiGLU pair
    (gate + up, which must share one smoothing factor since both read
    the same RMSNorm output) — detected by attribute presence."""
    pairs = []
    llama = hasattr(net, "gate1")
    moe = hasattr(net, "moe1")
    for i in range(1, net.depth + 1):
        pairs.append((f"ln1_{i}", [f"wq{i}", f"wk{i}", f"wv{i}"]))
        if llama:
            pairs.append((f"ln2_{i}", [f"gate{i}", f"up{i}"]))
        elif not moe:
            pairs.append((f"ln2_{i}", [f"fc1_{i}"]))
        # MoE: the ln2 boundary feeds the ROUTER plus every expert's
        # gate/up — smoothing there would rescale the router's logit
        # geometry (top-k selections are scale-sensitive per channel),
        # so the ln2->MoE boundary deliberately stays unsmoothed.
    pairs.append(("ln_f", ["head"]))
    return pairs


def smooth(net, pairs, x_calib, *, alpha: float = 0.5,
           verbose: bool = False):
    """Apply activation smoothing at each (ln_name, [linear_names]) pair.

    Must run before ``prepare()`` (calibration sees smoothed activations).
    Every listed Linear must consume the LN's output directly and the LN
    output must feed nothing else non-linear in scale (true for the
    attention/MLP stems here: the pre-LN residual branch reads ``x``, not
    ``ln(x)``).
    """
    if net.is_quant:
        raise RuntimeError("smooth must run before convert()")
    if getattr(net, "is_preparing", None) or any(
            l.is_preparing for _, l in net.named_layers()):
        raise RuntimeError("smooth must run before prepare() — the "
                           "calibrator must observe smoothed ranges")
    layers = dict(net.named_layers())

    tap: dict = {}
    token = _INPUT_TAP.set(tap)
    try:
        net.forward(Tensor(jnp.asarray(np.asarray(x_calib), jnp.float32)))
    finally:
        _INPUT_TAP.reset(token)

    for ln_name, lin_names in pairs:
        ln = layers[ln_name]
        lins = [layers[n] for n in lin_names]
        if not isinstance(ln, (QuantLayerNorm, QuantRMSNorm)) or not all(
                isinstance(l, Linear) for l in lins):
            raise TypeError(f"smooth pair ({ln_name}, {lin_names}) must be "
                            "a QuantLayerNorm/QuantRMSNorm feeding Linears")
        xs = tap.get(id(lins[0]))
        if not xs:
            raise ValueError(
                f"{lin_names[0]} saw no input in the tapped forward — is "
                "the pair actually on the forward path?")
        x = jnp.concatenate([v.reshape(-1, v.shape[-1]) for v in xs], 0)
        amax = jnp.maximum(jnp.max(jnp.abs(x), axis=0), 1e-5)
        wmax = jnp.maximum(
            jnp.max(jnp.stack([jnp.max(jnp.abs(l.params["weight"]), axis=0)
                               for l in lins]), axis=0), 1e-5)
        s = jnp.clip(amax ** alpha / wmax ** (1.0 - alpha), 1e-5, 1e5)
        if getattr(ln, "unit_offset", False):
            # gemma-family norms compute y = norm(x) * (1 + w): the
            # stored weight is a DELTA around one, so the exact fold is
            # (1 + w') = (1 + w)/s, NOT w/s (which silently rescales
            # the implicit unit gain — found by the trained-gemma
            # harness leg: ppl 6.47 -> 34.7 under the naive fold)
            ln.params["weight"] = (1.0 + ln.params["weight"]) / s - 1.0
        else:
            ln.params["weight"] = ln.params["weight"] / s
        if "bias" in ln.params:        # RMSNorm is bias-free
            ln.params["bias"] = ln.params["bias"] / s
        for l in lins:
            l.params["weight"] = l.params["weight"] * s.reshape(1, -1)
        if verbose:
            print(f"smooth {ln_name}: act amax {float(jnp.max(amax)):.3g} "
                  f"-> {float(jnp.max(amax / s)):.3g} "
                  f"(s in [{float(jnp.min(s)):.3g}, "
                  f"{float(jnp.max(s)):.3g}])")
    return net
