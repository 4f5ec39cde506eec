"""Grouped/depthwise conv + MobileNetV1 differential tests."""

import numpy as np
import pytest
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models
from int8inferenceengine_tpu.layers import Conv2d


def _rand(shape):
    return np.random.uniform(-1, 1, size=shape).astype(np.float32)


@pytest.mark.parametrize("groups,cin,cout", [(4, 8, 16), (8, 8, 8)])
def test_grouped_conv_fp32_matches_torch(groups, cin, cout):
    torch.set_num_threads(1)
    torch.manual_seed(0)
    tconv = torch.nn.Conv2d(cin, cout, 3, padding=1, groups=groups)
    conv = Conv2d(cin, cout, 3, padding=1, groups=groups)
    conv.load_weight(tconv.weight.detach().numpy())
    conv.load_bias(tconv.bias.detach().numpy())
    x = _rand((2, cin, 8, 8))
    want = tconv(torch.tensor(x)).detach().numpy()
    got = conv(q.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grouped_conv_int8_lifecycle():
    conv = Conv2d(8, 8, 3, padding=1, groups=8)   # depthwise
    rng = np.random.default_rng(0)
    conv.load_weight(np.float32(rng.normal(0, 0.3, (8, 1, 3, 3))))
    conv.load_bias(np.float32(rng.normal(0, 0.1, 8)))
    x = q.tensor(_rand((4, 8, 8, 8)))
    conv.prepare()
    ref = conv(x)
    conv.convert()
    from int8inferenceengine_tpu.ops import functional as F
    qx = F.quantize(x, 0.01, 127)
    out = F.dequantize(conv(qx)).numpy()
    err = np.abs(out - ref.numpy())
    assert err.mean() < 0.05, err.mean()


def test_groups_validation():
    with pytest.raises(ValueError, match="groups"):
        Conv2d(6, 8, 3, groups=4)


def test_mobilenet_ptq_lifecycle():
    torch.set_num_threads(1)
    tm = models.torch_twin("mobilenet_v1")
    mm = models.build("mobilenet_v1")
    mm.load(tm.state_dict())
    x = _rand((2, 3, 64, 64))   # adaptive pool handles reduced spatial
    ref = tm(torch.tensor(x)).detach().numpy()
    out = mm(q.tensor(x)).numpy()
    np.testing.assert_allclose(out, ref, atol=5e-3)
    mm.prepare()
    mm(q.tensor(_rand((2, 3, 64, 64))))
    mm.convert()
    qout = mm(q.tensor(x)).numpy()
    assert qout.shape == ref.shape and np.isfinite(qout).all()


def test_mobilenet_v2_ptq_lifecycle():
    """V2: inverted residuals — linear (two-sided) bottleneck outputs feeding
    QuantAdd residuals; FP32 parity vs the twin, then INT8 stays sane."""
    torch.set_num_threads(1)
    np.random.seed(0)
    tm = models.torch_twin("mobilenet_v2")
    mm = models.build("mobilenet_v2")
    mm.load(tm.state_dict())
    x = _rand((2, 3, 64, 64))
    ref = tm(torch.tensor(x)).detach().numpy()
    out = mm(q.tensor(x)).numpy()
    np.testing.assert_allclose(out, ref, atol=5e-3)
    mm.prepare()
    mm(q.tensor(_rand((2, 3, 64, 64))))
    mm.convert()
    qout = mm(q.tensor(x)).numpy()
    assert qout.shape == ref.shape and np.isfinite(qout).all()
    # every residual block got a calibrated QuantAdd
    from int8inferenceengine_tpu.layers import QuantAdd
    from int8inferenceengine_tpu.models.mobilenet import MOBILENET_V2_BLOCKS
    adds = [l for _, l in mm.named_layers() if isinstance(l, QuantAdd)]
    assert len(adds) == sum(res for *_, res in MOBILENET_V2_BLOCKS)
    assert all(l.is_quantized for l in adds)


def test_mobilenet_sharded_equals_unsharded():
    from int8inferenceengine_tpu.parallel.mesh import make_mesh
    torch.set_num_threads(1)
    tm = models.torch_twin("mobilenet_v1")
    mm = models.build("mobilenet_v1")
    mm.load(tm.state_dict())
    mm.prepare()
    mm(q.tensor(_rand((4, 3, 64, 64))))
    mm.convert()
    x = _rand((4, 3, 64, 64))
    base = mm(q.tensor(x)).numpy()
    mm.shard(make_mesh((2, 4)))
    np.testing.assert_array_equal(mm(q.tensor(x)).numpy(), base)
