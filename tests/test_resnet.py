"""ResNet-18: BN folding, QuantAdd, per-channel scales, full PTQ lifecycle."""

import numpy as np
import pytest
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models
from int8inferenceengine_tpu.layers import QuantAdd
from int8inferenceengine_tpu.models.resnet import fold_bn, fold_resnet_state_dict
from int8inferenceengine_tpu.ops import functional as F
from int8inferenceengine_tpu.tensor import Tensor


def _rand(shape, lo=-1.0, hi=1.0):
    return np.random.uniform(lo, hi, size=shape).astype(np.float32)


def test_fold_bn_matches_torch():
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(4, 8, 3, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(8)
    bn.train()
    with torch.no_grad():
        bn(conv(torch.randn(2, 4, 8, 8)))
    bn.eval()
    x = torch.randn(2, 4, 8, 8)
    want = bn(conv(x)).detach().numpy()

    w2, b2 = fold_bn(conv.weight.detach().numpy(),
                     np.zeros(8, np.float32),
                     bn.weight.detach().numpy(), bn.bias.detach().numpy(),
                     bn.running_mean.numpy(), bn.running_var.numpy())
    conv2 = torch.nn.Conv2d(4, 8, 3, padding=1)
    with torch.no_grad():
        conv2.weight.copy_(torch.tensor(w2))
        conv2.bias.copy_(torch.tensor(b2))
    got = conv2(x).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fold_state_dict_covers_all_convs():
    tm = models.torch_resnet18()
    folded = fold_resnet_state_dict(tm.state_dict())
    # every key is name.weight / name.bias, no BN keys remain
    assert all(k.rsplit(".", 1)[1] in ("weight", "bias") for k in folded)
    assert not any("running" in k or "bn" in k.split(".")[-2]
                   for k in folded)
    assert "layer2.0.downsample.0.weight" in folded
    assert "fc.weight" in folded


def test_quant_add_lifecycle():
    add = QuantAdd()
    a = Tensor(jnp_arr := np.random.uniform(-1, 1, (4, 8)).astype(np.float32))
    import jax.numpy as jnp
    a = Tensor(jnp.asarray(jnp_arr))
    b = Tensor(jnp.asarray(_rand((4, 8))))
    add.prepare()
    out = add(a, b)
    np.testing.assert_allclose(np.asarray(out.data),
                               np.asarray(a.data) + np.asarray(b.data),
                               rtol=1e-6)
    add.convert()
    qa = F.quantize(a, 0.02, 120)
    qb = F.quantize(b, 0.03, 110)
    qo = add(qa, qb)
    assert qo.quantized
    deq = F.dequantize(qo).numpy()
    want = np.asarray(a.data) + np.asarray(b.data)
    assert np.abs(deq - want).max() < 0.1


def test_quant_add_mixed_inputs_rejected():
    import jax.numpy as jnp
    add = QuantAdd()
    add.prepare()
    add.convert()
    a = F.quantize(Tensor(jnp.asarray(_rand((2, 4)))), 0.02, 127)
    b = Tensor(jnp.asarray(_rand((2, 4))))
    with pytest.raises(ValueError, match="both"):
        add(a, b)


@pytest.mark.parametrize("per_channel", [False, True])
def test_resnet18_ptq_lifecycle(per_channel):
    torch.set_num_threads(1)
    cfg = QuantConfig(weight_per_channel=per_channel)
    tm = models.torch_twin("resnet18")
    mm = models.build("resnet18", config=cfg)
    mm.load(tm.state_dict())

    # 64x64 input keeps CPU CI fast; adaptive pool handles any spatial size.
    x = _rand((4, 3, 64, 64))
    ref = tm(torch.tensor(x)).detach().numpy()
    out = mm(q.tensor(x)).numpy()
    np.testing.assert_allclose(out, ref, atol=2e-3)

    mm.prepare()
    mm(q.tensor(_rand((4, 3, 64, 64))))
    mm.convert()
    qout = mm(q.tensor(x)).numpy()
    assert qout.shape == ref.shape
    assert np.isfinite(qout).all()
    agree = (qout.argmax(1) == ref.argmax(1)).mean()
    assert agree >= 0.5, f"argmax agreement {agree}"


def test_per_channel_beats_or_matches_per_tensor_logit_error():
    torch.set_num_threads(1)
    tm = models.torch_twin("resnet18")
    x = _rand((4, 3, 64, 64))
    calib = _rand((8, 3, 64, 64))
    ref = tm(torch.tensor(x)).detach().numpy()

    errs = {}
    for pc in (False, True):
        mm = models.build("resnet18", config=QuantConfig(weight_per_channel=pc))
        mm.load(tm.state_dict())
        mm.prepare()
        mm(q.tensor(calib))
        mm.convert()
        errs[pc] = np.abs(mm(q.tensor(x)).numpy() - ref).mean()
    assert errs[True] <= errs[False] * 1.5, errs


def test_resnet_checkpoint_roundtrip(tmp_path):
    from int8inferenceengine_tpu import utils
    tm = models.torch_twin("resnet18")
    mm = models.build("resnet18",
                      config=QuantConfig(weight_per_channel=True))
    mm.load(tm.state_dict())
    mm.prepare()
    mm(q.tensor(_rand((2, 3, 64, 64))))
    mm.convert()
    x = _rand((2, 3, 64, 64))
    base = mm(q.tensor(x)).numpy()
    path = str(tmp_path / "r18.npz")
    utils.save(mm, path)
    fresh = models.build("resnet18",
                         config=QuantConfig(weight_per_channel=True))
    utils.load(fresh, path)
    np.testing.assert_array_equal(fresh(q.tensor(x)).numpy(), base)


def test_resnet_sharded_equals_unsharded():
    from int8inferenceengine_tpu.parallel.mesh import make_mesh
    tm = models.torch_twin("resnet18")
    mm = models.build("resnet18")
    mm.load(tm.state_dict())
    mm.prepare()
    mm(q.tensor(_rand((8, 3, 64, 64))))
    mm.convert()
    x = _rand((8, 3, 64, 64))
    base = mm(q.tensor(x)).numpy()
    mm.shard(make_mesh((2, 4)))
    np.testing.assert_array_equal(mm(q.tensor(x)).numpy(), base)


def test_resnet50_ptq_lifecycle():
    torch.set_num_threads(1)
    tm = models.torch_twin("resnet50")
    mm = models.build("resnet50",
                      config=QuantConfig(weight_per_channel=True))
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


@pytest.mark.parametrize("name", ["resnet34"])
def test_resnet34_fp32_and_ptq(name):
    import torch
    torch.set_num_threads(1)
    tm = models.torch_twin(name)
    mm = models.build(name)
    mm.load(tm.state_dict())
    x = np.random.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    want = tm(torch.tensor(x)).detach().numpy()
    got = mm(q.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-2)
    mm.prepare()
    mm(q.tensor(np.random.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)))
    mm.convert()
    qout = mm(q.tensor(x)).numpy()
    assert qout.shape == want.shape and np.isfinite(qout).all()


@pytest.mark.parametrize("name", ["resnet101", "resnet152"])
def test_deep_bottleneck_resnets(name):
    """ResNet-101/152 (stage-depth variants of the ResNet-50 builder):
    FP32 parity vs the torch twin and a full PTQ lifecycle."""
    import torch
    torch.set_num_threads(1)
    tm = models.torch_twin(name)
    mm = models.build(name)
    mm.load(tm.state_dict())
    x = np.random.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    want = tm(torch.tensor(x)).detach().numpy()
    got = mm(q.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=5e-2)
    mm.prepare()
    mm(q.tensor(np.random.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)))
    mm.convert()
    qout = mm(q.tensor(x)).numpy()
    assert qout.shape == want.shape and np.isfinite(qout).all()
