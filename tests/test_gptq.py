"""GPTQ (utils.gptq): Hessian-aware error compensation must beat
round-to-nearest on the layer-output objective at both W8 and W4, and
ride convert() through the override hooks."""

import numpy as np
import jax.numpy as jnp

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models, utils
from int8inferenceengine_tpu.layers import Linear


def _correlated(n, k, rank, seed):
    rng = np.random.default_rng(seed)
    return (rng.normal(0, 1, (n, rank)) @ rng.normal(0, 1, (rank, k))
            ).astype(np.float32)


class _One:
    is_quant = False

    def __init__(self, layer):
        self._l = layer

    def named_layers(self):
        return [("lin", self._l)]

    def forward(self, t):
        return self._l(t)


def _mse(layer, x, w, b):
    got = layer(q.tensor(x)).numpy()
    return float(np.mean((got - (x @ w.T + b)) ** 2))


def test_w4_gptq_beats_nearest_and_adaround():
    rng = np.random.default_rng(0)
    k, n_out = 128, 32
    w = rng.normal(0, 0.1, (n_out, k)).astype(np.float32)
    b = rng.normal(0, 0.05, n_out).astype(np.float32)
    x = _correlated(512, k, rank=6, seed=1)
    cfg = lambda: QuantConfig(weight_only=True, weight_bits=4, w4_group=64)

    errs = {}
    for method in ("nearest", "adaround", "gptq"):
        layer = Linear(k, n_out, config=cfg())
        layer.load_weight(w)
        layer.load_bias(b)
        if method == "adaround":
            utils.adaround(_One(layer), x, iters=300)
        elif method == "gptq":
            utils.gptq(_One(layer), x)
        layer.convert()
        errs[method] = _mse(layer, x, w, b)
    assert errs["gptq"] < errs["nearest"] * 0.7, errs
    # (adaround — iterative, per-layer gradient descent — can edge out the
    # one-pass GPTQ sweep on tiny low-rank problems; both are offered)


def test_w8_static_gptq_rides_convert():
    """W8A8 static path: the GPTQ integers flow into qw_kn/rowsum and the
    layer still serves u8 inputs, with smaller logit error."""
    rng = np.random.default_rng(2)
    k, n_out = 64, 16
    w = rng.normal(0, 0.1, (n_out, k)).astype(np.float32)
    b = rng.normal(0, 0.05, n_out).astype(np.float32)
    x = _correlated(512, k, rank=4, seed=3)

    outs = {}
    for use in (False, True):
        layer = Linear(k, n_out)
        layer.load_weight(w)
        layer.load_bias(b)
        layer.prepare()
        layer(q.tensor(x))
        if use:
            utils.gptq(_One(layer), x)
        layer.convert()
        from int8inferenceengine_tpu.ops import functional as F
        qx = F.quantize(q.tensor(x), float(np.abs(x).max()) / 127.0, 128)
        outs[use] = F.dequantize(layer(qx)).numpy()
    ref = x @ w.T + b
    e = {u: float(np.mean((v - ref) ** 2)) for u, v in outs.items()}
    assert e[True] < e[False], e


def test_model_level_gptq_w4():
    m = models.build("gpt_tiny", config=QuantConfig(weight_only=True,
                                                    weight_bits=4))
    m.load(models.torch_twin("gpt_tiny").state_dict())
    ids = np.random.default_rng(4).integers(0, 1000, (8, 64)).astype(
        np.int32)
    utils.gptq(m, ids)
    m.convert()
    toks = m.generate(ids[:2, :8], 5)
    assert toks.shape == (2, 5)
    out = m(q.tensor(ids)).numpy()
    assert np.isfinite(out).all()
