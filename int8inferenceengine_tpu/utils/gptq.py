"""GPTQ: Hessian-aware error-compensated weight quantization
(Frantar et al., ICLR 2023).

The strongest one-shot weight quantizer in the suite: where AdaRound
(utils/adaround.py) optimizes each weight's round-up/down jointly by
gradient descent, GPTQ quantizes columns IN ORDER and folds each column's
rounding error into the not-yet-quantized columns through the inverse
input Hessian ``H = 2 X^T X`` — the column update that exactly minimizes
the layer-output MSE given everything already committed:

    for k in 0..K-1:
        q_k    = quant(W[:, k])
        err    = (W[:, k] - dq(q_k)) / Hinv[k, k]
        W[:, k+1:] -= err · Hinv[k, k+1:]

Runs host-side at convert time (numpy; K <= a few thousand — the layers
here take milliseconds).  Supports the s8 paths (W8A8 static and W8-float:
fixed per-tensor/per-channel scale) and the W4 path (per-group scales
precomputed MSE-optimally from the original weights — measured better
than live scales from the compensated sweep).  Results ride the same
convert() override hooks as AdaRound (``_adaround_qw`` /
``_adaround_scales``).

    net.load(...)
    utils.gptq(net, x_calib)      # before prepare()/convert()
    ...prepare/calibrate if the act path needs it... convert()
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..layers import _INPUT_TAP, Linear
from ..tensor import Tensor

__all__ = ["gptq"]


def _layer_scale_s8(layer):
    """The fixed s8 scale convert() will use, broadcast to [N, 1]
    (from the shared layers.weight_quant_spec policy)."""
    from ..layers import weight_quant_spec
    w, s, bound, _ = weight_quant_spec(layer)
    assert bound == 127.0
    return np.broadcast_to(np.asarray(s, np.float32).reshape(-1, 1)
                           if getattr(s, "ndim", 0) else
                           np.float32(s) * np.ones((1, 1), np.float32),
                           (w.shape[0], 1)).copy()


def _gptq_layer(layer, x, damp: float):
    cfg = layer.config
    w = np.array(layer.params["weight"], np.float32)        # [N, K] copy
    n, k = w.shape
    h = 2.0 * (x.T @ x).astype(np.float64)                   # [K, K]
    h += np.eye(k) * (damp * float(np.mean(np.diag(h))) + 1e-8)
    hinv = np.linalg.inv(h)

    # both weight-only W4 and static W4A8 quantize Linear weights to
    # grouped 4-bit codes (layers.weight_quant_spec is the shared policy)
    w4 = cfg.weight_bits == 4
    if w4:
        from ..layers import weight_quant_spec
        g = min(cfg.w4_group, k)
        # group scales precomputed MSE-optimally from the ORIGINAL weights
        # (measured better than live scales from the compensated sweep:
        # the compensation drift inflates live group maxima)
        _, _, bound, scales_j = weight_quant_spec(layer)
        assert bound == 7.0
        scales = np.asarray(scales_j, np.float32)
    else:
        s_all = _layer_scale_s8(layer)                       # [N, 1]
        bound = 127.0
    q = np.zeros((n, k), np.int8)

    for j in range(k):
        s = scales[:, j // g] if w4 else s_all[:, 0]
        qj = np.clip(np.round(w[:, j] / s), -bound, bound)
        q[:, j] = qj.astype(np.int8)
        err = (w[:, j] - qj * s) / np.float32(hinv[j, j])
        if j + 1 < k:
            w[:, j + 1:] -= err[:, None] * hinv[j, j + 1:][None, :]

    layer._adaround_qw = jnp.asarray(q)
    if w4:
        layer._adaround_scales = jnp.asarray(scales)


def gptq(net, x_calib, *, damp: float = 0.01, max_rows: int = 4096,
         layers=None, verbose: bool = False):
    """Error-compensated quantization for every Linear in ``net``.

    Call before ``convert()`` (and before ``prepare()`` if you want the
    calibrators to see unperturbed FP32 activations — GPTQ only changes
    the integers convert() stores, not the float forward).  ``layers``
    optionally restricts to a set of layer names.
    """
    if net.is_quant:
        raise RuntimeError("gptq must run before convert()")
    tap: dict = {}
    token = _INPUT_TAP.set(tap)
    try:
        net.forward(Tensor(jnp.asarray(np.asarray(x_calib), jnp.float32)))
    finally:
        _INPUT_TAP.reset(token)

    rng = np.random.default_rng(0)
    for name, layer in net.named_layers():
        if not isinstance(layer, Linear):
            continue
        if layers is not None and name not in layers:
            continue
        xs = tap.get(id(layer))
        if not xs:
            continue
        x = np.concatenate([np.asarray(v, np.float32) for v in xs], 0)
        if x.shape[0] > max_rows:
            idx = np.sort(rng.choice(x.shape[0], max_rows, replace=False))
            x = x[idx]
        _gptq_layer(layer, x, damp)
        if verbose:
            print(f"gptq {name}: K={x.shape[1]}, {x.shape[0]} rows")
    return net
