"""Bias correction (config.bias_correction) — the third accuracy lever
alongside per-channel scales and cross-layer equalization (Nagel et al.
ICCV'19 data-free quantization pipeline)."""

import numpy as np
import pytest
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models
from int8inferenceengine_tpu.layers import Conv2d, Linear
from int8inferenceengine_tpu.ops import functional as F


def _rand(shape, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=shape).astype(np.float32)


def _channel_shift(layer_ctor, load, x_calib, run, channel_axis=1):
    """|batch-mean INT8-vs-FP32 error| per output channel — the systematic
    shift bias correction targets (elementwise rounding noise cancels in
    the mean)."""
    errs = {}
    for corrected in (False, True):
        layer = layer_ctor(QuantConfig(bias_correction=corrected))
        load(layer)
        layer.prepare()
        ref = run(layer, q.tensor(x_calib))
        layer.convert()
        want = np.asarray(ref.numpy())
        qx = F.quantize(q.tensor(x_calib), 1 / 32.0, 0)
        got = F.dequantize(run(layer, qx)).numpy()
        diff = got - want
        axes = tuple(i for i in range(diff.ndim) if i != channel_axis)
        shift = diff.mean(axis=axes)
        # subtract the common-mode output-truncation bias (-s_c/2, equal in
        # both configs — the rounding lever's territory, not this one's)
        errs[corrected] = np.abs(shift - np.median(shift)).mean()
    return errs


def test_linear_bias_correction_reduces_error():
    # A weight matrix with one large outlier row inflates the per-tensor
    # scale -> systematic quantization error the correction removes.
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.05, (16, 64)).astype(np.float32)
    w[0] += 2.0
    b = rng.normal(0, 0.1, 16).astype(np.float32)
    # biased (non-zero-mean) input makes E[(W - Wq)x] a real shift;
    # exactly-representable codes (k/32 at scale 1/32) zero out the input
    # truncation bias so the weight-rounding shift is isolated
    x = (np.random.default_rng(1).integers(0, 32, (256, 64)) / 32.0
         ).astype(np.float32)

    def load(l):
        l.load_weight(w)
        l.load_bias(b)

    errs = _channel_shift(lambda c: Linear(64, 16, config=c), load, x,
                          lambda l, t: l(t))
    assert errs[True] < errs[False] * 0.5, errs


def test_conv_bias_correction_reduces_error():
    rng = np.random.default_rng(2)
    w = rng.normal(0, 0.05, (8, 4, 3, 3)).astype(np.float32)
    w[0] += 1.5
    b = rng.normal(0, 0.1, 8).astype(np.float32)
    x = (np.random.default_rng(3).integers(0, 32, (16, 4, 8, 8)) / 32.0
         ).astype(np.float32)

    def load(l):
        l.load_weight(w)
        l.load_bias(b)

    errs = _channel_shift(lambda c: Conv2d(4, 8, 3, padding=1, config=c),
                          load, x, lambda l, t: l(t))
    assert errs[True] < errs[False] * 0.7, errs


def test_bias_correction_under_jitted_calibration():
    """The in_mean observation must survive the one-program jitted
    calibration path (Module._calibrate_jit)."""
    torch.set_num_threads(1)
    cfg = QuantConfig(bias_correction=True)
    tm = models.torch_twin("lenet")
    mm = models.build("lenet", config=cfg)
    mm.load(tm.state_dict())
    x = _rand((8, 1, 28, 28), seed=4)
    mm.prepare()
    mm(q.tensor(x))          # jitted calibration (exact_minmax default)
    assert mm.conv1._in_mean is not None
    assert mm.fc1._in_mean is not None and mm.fc1._in_count == 8
    mm.convert()
    out = mm(q.tensor(x)).numpy()
    ref = tm(torch.tensor(x)).detach().numpy()
    assert np.isfinite(out).all()
    assert (out.argmax(1) == ref.argmax(1)).mean() >= 0.8


def test_depthwise_conv_skipped():
    """Grouped convs are excluded (documented) — no observation, no crash."""
    conv = Conv2d(8, 8, 3, groups=8, padding=1,
                  config=QuantConfig(bias_correction=True))
    rng = np.random.default_rng(0)
    conv.load_weight(np.float32(rng.normal(0, 0.3, (8, 1, 3, 3))))
    conv.load_bias(np.float32(rng.normal(0, 0.1, 8)))
    conv.prepare()
    conv(q.tensor(_rand((2, 8, 6, 6))))
    assert conv._in_mean is None
    conv.convert()
    assert conv.is_quantized
