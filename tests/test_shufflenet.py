"""ShuffleNetV2 + channel shuffle/split op tests."""

import numpy as np
import pytest
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models
from int8inferenceengine_tpu.ops import functional as F


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=shape).astype(np.float32)


def test_channel_shuffle_matches_torch():
    x = _rand((2, 8, 3, 3))
    got = F.channel_shuffle(q.tensor(x), 2).numpy()
    t = torch.tensor(x)
    want = (t.reshape(2, 2, 4, 3, 3).transpose(1, 2)
            .reshape(2, 8, 3, 3).numpy())
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="divisible"):
        F.channel_shuffle(q.tensor(_rand((1, 6, 2, 2))), 4)


def test_channel_shuffle_quantized_roundtrip():
    """shuffle(shuffle(x, 2), k/2 groups-inverse) is the identity; scale/zp
    pass through untouched."""
    x = F.quantize(q.tensor(_rand((2, 12, 4, 4))), 0.05, 128)
    y = F.channel_shuffle(x, 2)
    assert (y.scale, y.zero_point) == (x.scale, x.zero_point)
    z = F.channel_shuffle(y, 6)   # inverse permutation for c=12, g=2
    np.testing.assert_array_equal(np.asarray(z.data), np.asarray(x.data))


def test_split_channels():
    x = F.quantize(q.tensor(_rand((2, 10, 4, 4))), 0.05, 128)
    a, b = F.split_channels(x, 2)
    assert a.shape == b.shape == (2, 5, 4, 4)
    assert a.scale == x.scale and b.zero_point == x.zero_point
    with pytest.raises(ValueError, match="divisible"):
        F.split_channels(x, 3)


def test_shufflenet_v2_ptq_lifecycle():
    torch.set_num_threads(1)
    tm = models.torch_twin("shufflenet_v2")
    mm = models.build("shufflenet_v2")
    mm.load(tm.state_dict())
    x = _rand((2, 3, 64, 64))
    ref = tm(torch.tensor(x)).detach().numpy()
    out = mm(q.tensor(x)).numpy()
    np.testing.assert_allclose(out, ref, atol=5e-3)
    mm.prepare()
    mm(q.tensor(_rand((2, 3, 64, 64), seed=1)))
    mm.convert()
    qout = mm(q.tensor(x)).numpy()
    assert qout.shape == ref.shape and np.isfinite(qout).all()
    from int8inferenceengine_tpu.layers import QuantConcat
    from int8inferenceengine_tpu.models.shufflenet import SHUFFLENET_V2_BLOCKS
    cats = [l for _, l in mm.named_layers() if isinstance(l, QuantConcat)]
    assert len(cats) == len(SHUFFLENET_V2_BLOCKS) == 16
    assert all(l.is_quantized for l in cats)
