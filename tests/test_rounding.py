"""rounding='nearest' — removes the reference's C-cast truncation biases.

Default stays 'trunc' (bit-parity with quantize_utils.cc); 'nearest'
rounds at input quantization, weight quantization, and every requant
epilogue.  The measured systematic output shift under trunc is ~-s_c/2
per channel; nearest should collapse it.
"""

import numpy as np
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models
from int8inferenceengine_tpu.layers import Linear
from int8inferenceengine_tpu.ops import functional as F
from int8inferenceengine_tpu.ops import quant as quant_ops


def _rand(shape, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=shape).astype(np.float32)


def test_quantize_u8_nearest():
    import jax.numpy as jnp
    x = jnp.asarray([0.0, 0.49, 0.51, 254.6, 255.4, 300.0, -5.0])
    tr = np.asarray(quant_ops.quantize_u8(x, 1.0, 0))
    nr = np.asarray(quant_ops.quantize_u8(x, 1.0, 0, "nearest"))
    np.testing.assert_array_equal(tr, [0, 0, 0, 254, 255, 255, 0])
    np.testing.assert_array_equal(nr, [0, 0, 1, 255, 255, 255, 0])


def test_quantize_s8_nearest():
    import jax.numpy as jnp
    x = jnp.asarray([0.6, -0.6, 1.4, -1.4, 200.0, -200.0])
    tr = np.asarray(quant_ops.quantize_s8(x, 1.0))
    nr = np.asarray(quant_ops.quantize_s8(x, 1.0, "nearest"))
    np.testing.assert_array_equal(tr, [0, 0, 1, -1, 127, -127])
    np.testing.assert_array_equal(nr, [1, -1, 1, -1, 127, -127])


def test_linear_nearest_removes_truncation_shift():
    """Per-channel mean INT8-vs-FP32 shift collapses under nearest."""
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.1, (16, 64)).astype(np.float32)
    b = rng.normal(0, 0.1, 16).astype(np.float32)
    x = _rand((512, 64), seed=1, lo=0.0, hi=1.0)
    shifts = {}
    for mode in ("trunc", "nearest"):
        l = Linear(64, 16, config=QuantConfig(rounding=mode))
        l.load_weight(w)
        l.load_bias(b)
        l.prepare()
        ref = l(q.tensor(x))
        l.convert()
        qx = F.quantize(q.tensor(x), 1 / 255.0, 0, rounding=mode)
        got = F.dequantize(l(qx)).numpy()
        diff = got - np.asarray(ref.numpy())
        shifts[mode] = np.abs(diff.mean(axis=0)).mean()
    assert shifts["nearest"] < shifts["trunc"] * 0.7, shifts


def test_lenet_nearest_improves_agreement():
    """End-to-end: nearest rounding's INT8 logits track FP32 at least as
    well as trunc on the LeNet twin."""
    torch.set_num_threads(1)
    tm = models.torch_twin("lenet")
    x = _rand((64, 1, 28, 28), seed=2)
    calib = _rand((32, 1, 28, 28), seed=3)
    errs = {}
    for mode in ("trunc", "nearest"):
        mm = models.build("lenet", config=QuantConfig(rounding=mode))
        mm.load(tm.state_dict())
        mm.prepare()
        mm(q.tensor(calib))
        mm.convert()
        ref = tm(torch.tensor(x)).detach().numpy()
        errs[mode] = np.abs(mm(q.tensor(x)).numpy() - ref).mean()
    assert errs["nearest"] <= errs["trunc"] * 1.05, errs


def test_default_is_reference_trunc():
    """The zero-config path must stay bit-compatible with the reference's
    C-cast truncation."""
    assert QuantConfig().rounding == "trunc"
    x = _rand((4, 16), seed=5)
    a = F.quantize(q.tensor(x), 0.01, 128)
    b = F.quantize(q.tensor(x), 0.01, 128, rounding="trunc")
    np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))
