"""Full PTQ lifecycle integration test on a LeNet-style net, lockstep
against the torch FP32 oracle (reference: unittest/test_quantized_layer.py).

Statistical tolerance matches the reference: >= 80% of elements within
rtol=0.3 after dequantization (:59-61) — requantization noise is expected.
Seeds are fixed (an improvement over the reference's unseeded RNG).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as tF

import int8inferenceengine_tpu as q


class TorchNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 20, kernel_size=5)
        self.conv2 = nn.Conv2d(20, 50, kernel_size=5)
        self.fc1 = nn.Linear(800, 500)
        self.fc2 = nn.Linear(500, 10)

    def forward(self, x):
        x = self.conv1(x)
        x = tF.max_pool2d(x, kernel_size=2, stride=2)
        x = self.conv2(x)
        x = tF.max_pool2d(x, kernel_size=2, stride=2)
        x = x.view(-1, 800)
        x = tF.relu(self.fc1(x))
        x = self.fc2(x)
        return x


class MyNet(q.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = q.Conv2d(1, 20, kernel_size=5)
        self.conv2 = q.Conv2d(20, 50, kernel_size=5)
        self.fc1 = q.Linear(800, 500)
        self.fc2 = q.Linear(500, 10)

    def forward(self, x):
        x = self.conv1(x)
        x = q.max_pool2d(x, kernel_size=2, stride=2)
        x = self.conv2(x)
        x = q.max_pool2d(x, kernel_size=2, stride=2)
        x = x.reshape(-1, 800)
        x = q.relu(self.fc1(x))
        x = self.fc2(x)
        return x


def _rand(shape):
    return np.random.uniform(-2, 2, size=shape).astype(np.float32)


def assert_close_enough(a, b, frac=0.8, rtol=0.3):
    ok = np.isclose(a, b, rtol=rtol).sum()
    assert ok > frac * a.size, f"only {ok}/{a.size} within rtol={rtol}"


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(42)
    torch.set_num_threads(1)
    tm = TorchNet()
    mm = MyNet()
    mm.load(tm.state_dict())
    mm.prepare()
    mm(q.tensor(_rand((100, 1, 28, 28))))
    mm.convert()
    return tm, mm


def test_each_layer_lockstep(models):
    tm, mm = models
    x = _rand((10, 1, 28, 28))
    qx = mm.conv1(q.quantize(q.tensor(x), 0.025, 127))
    tx = tm.conv1(torch.tensor(x))
    assert_close_enough(tx.detach().numpy(), q.dequantize(qx).numpy())

    qx = q.max_pool2d(qx, kernel_size=2, stride=2)
    tx = tF.max_pool2d(tx, kernel_size=2, stride=2)
    assert_close_enough(tx.detach().numpy(), q.dequantize(qx).numpy())

    qx = mm.conv2(qx)
    tx = tm.conv2(tx)
    assert_close_enough(tx.detach().numpy(), q.dequantize(qx).numpy())

    qx = q.max_pool2d(qx, kernel_size=2, stride=2)
    tx = tF.max_pool2d(tx, kernel_size=2, stride=2)
    assert_close_enough(tx.detach().numpy(), q.dequantize(qx).numpy())

    qx = qx.reshape(-1, 800)
    tx = tx.reshape(-1, 800)
    qx = q.relu(mm.fc1(qx))
    tx = tF.relu(tm.fc1(tx))
    assert_close_enough(tx.detach().numpy(), q.dequantize(qx).numpy())

    qx = mm.fc2(qx)
    tx = tm.fc2(tx)
    assert_close_enough(tx.detach().numpy(), q.dequantize(qx).numpy())


def test_end_to_end_jitted(models):
    """The jitted whole-model path agrees with torch FP32 end to end."""
    tm, mm = models
    x = _rand((10, 1, 28, 28))
    out = mm(q.tensor(x)).numpy()
    ref = tm(torch.tensor(x)).detach().numpy()
    assert out.shape == ref.shape
    assert_close_enough(ref, out, frac=0.7)  # two requant layers of noise
    # Prediction agreement is what matters for accuracy parity.
    agree = (out.argmax(1) == ref.argmax(1)).mean()
    assert agree >= 0.8, f"argmax agreement {agree}"


def test_jit_cache_reuse(models):
    _, mm = models
    mm(q.tensor(_rand((10, 1, 28, 28))))
    fn = mm._jit_fn
    mm(q.tensor(_rand((10, 1, 28, 28))))
    assert mm._jit_fn is fn


def test_conv_gemm_backend_matches_xla_conv(models):
    """The im2col+GEMM conv path must agree with the native XLA int8 conv."""
    _, mm = models
    x = q.quantize(q.tensor(_rand((4, 1, 28, 28))), 0.025, 127)
    layer = mm.conv1
    out_xla = layer(x)
    saved = layer.config
    try:
        layer.config = q.QuantConfig(conv_backend="gemm", kernel_backend="xla")
        out_gemm = layer(x)
    finally:
        layer.config = saved
    np.testing.assert_array_equal(np.asarray(out_xla.data),
                                  np.asarray(out_gemm.data))


def test_unprepared_convert_uses_defaults():
    with np.errstate(all="ignore"):
        layer = q.Linear(4, 2)
        layer.load_weight(_rand((2, 4)))
        layer.load_bias(_rand((2,)))
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            layer.convert()
    assert layer.scale == 1.0 and layer.zero_point == 0
    assert layer.is_quantized
