"""MobileNetV3 differential tests: hardswish + squeeze-excite family.

Reference-notebook workflow (load twin state_dict -> FP32 parity ->
calibrate -> INT8 sanity), per SURVEY.md §4's differential pattern, on the
first zoo family exercising QuantAct and QuantMul at scale.
"""

import numpy as np
import pytest
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models
from int8inferenceengine_tpu.layers import QuantAct, QuantMul


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=shape).astype(np.float32)


@pytest.mark.parametrize("name", ["mobilenet_v3_small", "mobilenet_v3_large"])
def test_v3_ptq_lifecycle(name):
    torch.set_num_threads(1)
    tm = models.torch_twin(name)
    mm = models.build(name)
    mm.load(tm.state_dict())
    x = _rand((2, 3, 64, 64))   # adaptive pool handles reduced spatial
    ref = tm(torch.tensor(x)).detach().numpy()
    out = mm(q.tensor(x)).numpy()
    np.testing.assert_allclose(out, ref, atol=5e-3)
    mm.prepare()
    mm(q.tensor(_rand((2, 3, 64, 64), seed=1)))
    mm.convert()
    qout = mm(q.tensor(x)).numpy()
    assert qout.shape == ref.shape and np.isfinite(qout).all()
    # every HS site and SE gate got calibrated
    acts = [l for _, l in mm.named_layers() if isinstance(l, QuantAct)]
    muls = [l for _, l in mm.named_layers() if isinstance(l, QuantMul)]
    assert all(l.is_quantized for l in acts + muls)
    blocks = mm._blocks
    assert len(muls) == sum(se for _, _, _, se, _, _ in blocks)


def test_v3_structure():
    """Attribute/layer counts match the paper tables."""
    from int8inferenceengine_tpu.models.mobilenet_v3 import V3_LARGE, V3_SMALL
    large = models.build("mobilenet_v3_large")
    small = models.build("mobilenet_v3_small")
    assert len(V3_LARGE) == 15 and len(V3_SMALL) == 11
    for mm, blocks in ((large, V3_LARGE), (small, V3_SMALL)):
        convs = [n for n, l in mm.named_layers()
                 if type(l).__name__ == "Conv2d"]
        n_exp = sum(1 for i, (k, exp, out, se, nl, s)
                    in enumerate(blocks, 1)
                    if exp != (16 if i == 1 else blocks[i - 2][2]))
        n_se = sum(se for _, _, _, se, _, _ in blocks)
        # stem + last + per-block (dw + pw + optional exp) + 2 per SE
        assert len(convs) == 2 + 2 * len(blocks) + n_exp + 2 * n_se
    with pytest.raises(ValueError, match="variant"):
        models.MobileNetV3(variant="medium")


def test_v3_small_sharded_equals_unsharded():
    from int8inferenceengine_tpu.parallel.mesh import make_mesh
    torch.set_num_threads(1)
    tm = models.torch_twin("mobilenet_v3_small")
    mm = models.build("mobilenet_v3_small")
    mm.load(tm.state_dict())
    mm.prepare()
    mm(q.tensor(_rand((4, 3, 64, 64))))
    mm.convert()
    x = _rand((4, 3, 64, 64), seed=3)
    base = mm(q.tensor(x)).numpy()
    mm.shard(make_mesh((2, 4)))
    np.testing.assert_array_equal(mm(q.tensor(x)).numpy(), base)
