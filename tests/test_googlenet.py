"""GoogLeNet (Inception v1) differential tests: 4-way QuantConcat blocks."""

import numpy as np
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models


def _rand(shape):
    return np.random.uniform(-1, 1, size=shape).astype(np.float32)


def test_googlenet_fp32_matches_torch():
    torch.set_num_threads(1)
    tm = models.torch_twin("googlenet")
    mm = models.build("googlenet")
    mm.load(tm.state_dict())
    x = _rand((2, 3, 64, 64))
    want = tm(torch.tensor(x)).detach().numpy()
    got = mm(q.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_googlenet_ptq_lifecycle():
    torch.set_num_threads(1)
    tm = models.torch_twin("googlenet")
    mm = models.build("googlenet")
    mm.load(tm.state_dict())
    x = _rand((4, 3, 64, 64))
    ref = tm(torch.tensor(x)).detach().numpy()
    mm.prepare()
    mm(q.tensor(_rand((4, 3, 64, 64))))
    mm.convert()
    qout = mm(q.tensor(x)).numpy()
    assert qout.shape == ref.shape and np.isfinite(qout).all()


def test_googlenet_sharded_equals_unsharded():
    from int8inferenceengine_tpu.parallel.mesh import make_mesh
    torch.set_num_threads(1)
    tm = models.torch_twin("googlenet")
    mm = models.build("googlenet")
    mm.load(tm.state_dict())
    mm.prepare()
    mm(q.tensor(_rand((4, 3, 64, 64))))
    mm.convert()
    x = _rand((4, 3, 64, 64))
    base = mm(q.tensor(x)).numpy()
    mm.shard(make_mesh((2, 4)))
    np.testing.assert_array_equal(mm(q.tensor(x)).numpy(), base)
