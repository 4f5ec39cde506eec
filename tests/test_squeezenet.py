"""QuantConcat, ceil-mode pooling, and SqueezeNet differential tests."""

import numpy as np
import pytest
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models
from int8inferenceengine_tpu.ops import functional as F


def _rand(shape):
    return np.random.uniform(-1, 1, size=shape).astype(np.float32)


@pytest.mark.parametrize("size,k,s,p", [(7, 3, 2, 0), (111, 3, 2, 0),
                                        (10, 2, 2, 0), (9, 3, 2, 1)])
def test_max_pool2d_ceil_mode_matches_torch(size, k, s, p):
    torch.set_num_threads(1)
    x = _rand((2, 4, size, size))
    want = torch.nn.functional.max_pool2d(
        torch.tensor(x), k, s, padding=p, ceil_mode=True).numpy()
    got = F.max_pool2d(q.tensor(x), k, s, padding=p, ceil_mode=True).numpy()
    np.testing.assert_array_equal(got, want)


def test_quant_concat_fp32_and_observe():
    cat = q.QuantConcat()
    a = q.tensor(_rand((2, 3, 4, 4)))
    b = q.tensor(_rand((2, 5, 4, 4)))
    cat.prepare()
    out = cat(a, b)
    assert out.shape == (2, 8, 4, 4)
    np.testing.assert_array_equal(
        out.numpy(), np.concatenate([a.numpy(), b.numpy()], axis=1))
    cat.convert()
    assert cat.is_quantized


def test_quant_concat_int8_requantizes_to_one_range():
    cat = q.QuantConcat()
    rng = np.random.default_rng(0)
    fa = np.float32(rng.uniform(0, 2, (2, 3, 4, 4)))
    fb = np.float32(rng.uniform(-1, 1, (2, 5, 4, 4)))
    cat.prepare()
    ref = cat(q.tensor(fa), q.tensor(fb))
    cat.convert()
    qa = F.quantize(q.tensor(fa), 0.01, 0)
    qb = F.quantize(q.tensor(fb), 0.008, 128)
    out = cat(qa, qb)
    assert out.quantized
    assert (out.scale, out.zero_point) == (cat.scale, cat.zero_point)
    err = np.abs(F.dequantize(out).numpy()
                 - np.concatenate([fa, fb], axis=1))
    assert err.mean() < 0.05, err.mean()


def test_quant_concat_guards():
    cat = q.QuantConcat()
    a = q.tensor(_rand((2, 3, 4, 4)))
    with pytest.raises(ValueError, match="at least two"):
        cat(a)
    qa = F.quantize(a, 0.01, 127)
    with pytest.raises(ValueError, match="all inputs"):
        cat(a, qa)
    with pytest.raises(RuntimeError, match="not converted"):
        cat(qa, qa)


def test_squeezenet_fp32_matches_torch():
    torch.set_num_threads(1)
    tm = models.torch_twin("squeezenet")
    mm = models.build("squeezenet")
    mm.load(tm.state_dict())
    x = _rand((2, 3, 64, 64))
    want = tm(torch.tensor(x)).detach().numpy()
    got = mm(q.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_squeezenet_ptq_lifecycle():
    torch.set_num_threads(1)
    tm = models.torch_twin("squeezenet")
    mm = models.build("squeezenet")
    mm.load(tm.state_dict())
    x = _rand((4, 3, 64, 64))
    ref = tm(torch.tensor(x)).detach().numpy()
    mm.prepare()
    mm(q.tensor(_rand((4, 3, 64, 64))))
    mm.convert()
    qout = mm(q.tensor(x)).numpy()
    assert qout.shape == ref.shape and np.isfinite(qout).all()
    agree = (qout.argmax(1) == ref.argmax(1)).mean()
    assert agree >= 0.5, agree   # random-init logits are near-ties


def test_squeezenet_sharded_equals_unsharded():
    from int8inferenceengine_tpu.parallel.mesh import make_mesh
    torch.set_num_threads(1)
    tm = models.torch_twin("squeezenet")
    mm = models.build("squeezenet")
    mm.load(tm.state_dict())
    mm.prepare()
    mm(q.tensor(_rand((4, 3, 64, 64))))
    mm.convert()
    x = _rand((4, 3, 64, 64))
    base = mm(q.tensor(x)).numpy()
    mm.shard(make_mesh((2, 4)))
    np.testing.assert_array_equal(mm(q.tensor(x)).numpy(), base)
