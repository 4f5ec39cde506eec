"""QuantAct (calibrated nonlinear activations) + QuantMul (SE gating) tests.

These primitives are TPU-side extensions beyond the reference (whose only
nonlinearity is the calibration-free relu-at-zp, functional.cc:15-26); they
follow the same PTQ lifecycle as every compute layer.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu.layers import QuantAct, QuantMul
from int8inferenceengine_tpu.ops import functional as F


def _rand(shape, lo=-4.0, hi=4.0, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=shape).astype(np.float32)


_TORCH_FNS = {
    "relu": tF.relu,
    "relu6": tF.relu6,
    "hardsigmoid": tF.hardsigmoid,
    "hardswish": tF.hardswish,
    "silu": tF.silu,
    "gelu": tF.gelu,
}


@pytest.mark.parametrize("name", sorted(_TORCH_FNS))
def test_fp32_matches_torch(name):
    """The float-domain definitions match torch.nn.functional exactly."""
    act = QuantAct(name)
    x = _rand((3, 257))
    got = act(q.tensor(x)).numpy()
    want = _TORCH_FNS[name](torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_unknown_activation_rejected():
    with pytest.raises(ValueError, match="unknown activation"):
        QuantAct("swishish")
    with pytest.raises(ValueError, match="backend"):
        QuantAct("silu", backend="magic")


def _calibrated_act(name, x_calib, backend="elementwise"):
    act = QuantAct(name, backend=backend)
    act.prepare()
    act(q.tensor(x_calib))
    act.convert()
    return act


@pytest.mark.parametrize("name", ["hardswish", "silu", "gelu"])
def test_int8_tracks_fp32(name):
    """u8 -> dequant -> fn -> requant stays close to the float activation."""
    x = _rand((4, 64, 3))
    act = _calibrated_act(name, x)
    qx = F.quantize(q.tensor(x), 0.03, 128)
    out = F.dequantize(act(qx)).numpy()
    want = _TORCH_FNS[name](torch.tensor(
        F.dequantize(qx).numpy())).numpy()
    # one input step is 0.03, one output step is act.scale
    assert np.abs(out - want).max() < 0.06 + act.scale, (
        np.abs(out - want).max())


@pytest.mark.parametrize("name", ["hardsigmoid", "hardswish", "silu", "gelu",
                                  "relu6"])
def test_lut_backend_bit_identical(name):
    """The 256-entry LUT and the elementwise map agree on every code."""
    x = _rand((2, 300))
    e = _calibrated_act(name, x)
    l = _calibrated_act(name, x, backend="lut")
    assert (e.scale, e.zero_point) == (l.scale, l.zero_point)
    # feed every u8 code
    codes = np.arange(256, dtype=np.float32).reshape(1, 256)
    from int8inferenceengine_tpu.tensor import Tensor
    import jax.numpy as jnp
    qx = Tensor(jnp.asarray(codes).astype(jnp.uint8), 0.05, 120)
    np.testing.assert_array_equal(np.asarray(e(qx).data),
                                  np.asarray(l(qx).data))


def test_unconverted_int8_input_rejected():
    act = QuantAct("silu")
    qx = F.quantize(q.tensor(_rand((2, 8))), 0.05, 128)
    with pytest.raises(RuntimeError, match="not converted"):
        act(qx)


def test_custom_callable():
    import jax.numpy as jnp
    act = QuantAct(lambda v: jnp.square(v))
    x = _rand((2, 16))
    np.testing.assert_allclose(act(q.tensor(x)).numpy(), x * x, atol=1e-6)


# ---------------------------------------------------------------- QuantMul

def test_quantmul_fp32_and_broadcast():
    mul = QuantMul()
    a = _rand((2, 8, 5, 5), seed=1)
    gate = _rand((2, 8, 1, 1), lo=0.0, hi=1.0, seed=2)
    out = mul(q.tensor(a), q.tensor(gate)).numpy()
    np.testing.assert_allclose(out, a * gate, atol=1e-6)


def test_quantmul_int8_tracks_fp32():
    mul = QuantMul()
    a = _rand((2, 8, 5, 5), seed=1)
    gate = _rand((2, 8, 1, 1), lo=0.0, hi=1.0, seed=2)
    mul.prepare()
    mul(q.tensor(a), q.tensor(gate))
    mul.convert()
    qa = F.quantize(q.tensor(a), 0.04, 128)
    qg = F.quantize(q.tensor(gate), 1 / 255.0, 0)
    out = F.dequantize(mul(qa, qg)).numpy()
    want = F.dequantize(qa).numpy() * F.dequantize(qg).numpy()
    assert np.abs(out - want).max() < 2 * mul.scale + 0.05


def test_quantmul_mixed_inputs_rejected():
    mul = QuantMul()
    a = q.tensor(_rand((2, 4)))
    qb = F.quantize(q.tensor(_rand((2, 4))), 0.05, 128)
    with pytest.raises(ValueError, match="both"):
        mul(a, qb)


def test_se_block_end_to_end():
    """A full squeeze-excite: pool -> 1x1 reduce -> relu -> 1x1 expand ->
    hardsigmoid -> gate, through the whole PTQ lifecycle inside a Module."""
    from int8inferenceengine_tpu.layers import Conv2d

    class SENet(q.Module):
        def __init__(self):
            super().__init__()
            self.conv = Conv2d(3, 16, 3, padding=1)
            self.fc1 = Conv2d(16, 8, 1)
            self.fc2 = Conv2d(8, 16, 1)
            self.gate = QuantAct("hardsigmoid")
            self.mul = QuantMul()

        def forward(self, x):
            x = F.relu(self.conv(x))
            s = F.adaptive_avg_pool2d_1x1(x)
            s = F.relu(self.fc1(s))
            s = self.gate(self.fc2(s))
            return self.mul(x, s)

    torch.set_num_threads(1)
    torch.manual_seed(0)
    tconv = torch.nn.Conv2d(3, 16, 3, padding=1)
    tfc1 = torch.nn.Conv2d(16, 8, 1)
    tfc2 = torch.nn.Conv2d(8, 16, 1)

    def torch_fwd(x):
        h = tF.relu(tconv(x))
        s = tF.adaptive_avg_pool2d(h, (1, 1))
        s = tF.hardsigmoid(tfc2(tF.relu(tfc1(s))))
        return h * s

    net = SENet()
    net.load({**{f"conv.{k}": v for k, v in tconv.state_dict().items()},
              **{f"fc1.{k}": v for k, v in tfc1.state_dict().items()},
              **{f"fc2.{k}": v for k, v in tfc2.state_dict().items()}})
    x = _rand((2, 3, 12, 12), lo=-1, hi=1)
    want = torch_fwd(torch.tensor(x)).detach().numpy()
    got = net(q.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)

    net.prepare()
    net(q.tensor(_rand((4, 3, 12, 12), lo=-1, hi=1, seed=7)))
    net.convert()
    assert net.gate.is_quantized and net.mul.is_quantized
    qout = net(q.tensor(x)).numpy()
    assert qout.shape == want.shape
    assert np.abs(qout - want).mean() < 0.1
