"""EfficientNet-B0 differential tests: SiLU + per-block SE MBConv family.

The hardest PTQ workload in the zoo — every activation is a calibrated
QuantAct (SiLU/sigmoid), every block gates through QuantMul.  Reference
workflow per SURVEY.md §4: load twin state_dict -> FP32 parity ->
calibrate -> INT8 sanity.
"""

import numpy as np
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models
from int8inferenceengine_tpu.layers import QuantAct, QuantAdd, QuantMul
from int8inferenceengine_tpu.models.efficientnet import B0_BLOCKS


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=shape).astype(np.float32)


def test_b0_structure():
    assert len(B0_BLOCKS) == 16
    mm = models.build("efficientnet_b0")
    muls = [l for _, l in mm.named_layers() if isinstance(l, QuantMul)]
    adds = [l for _, l in mm.named_layers() if isinstance(l, QuantAdd)]
    assert len(muls) == 16                     # SE on every block
    assert len(adds) == sum(res for *_, res in B0_BLOCKS) == 9


def test_b0_ptq_lifecycle():
    torch.set_num_threads(1)
    tm = models.torch_twin("efficientnet_b0")
    mm = models.build("efficientnet_b0")
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
    acts = [l for _, l in mm.named_layers() if isinstance(l, QuantAct)]
    assert all(l.is_quantized for l in acts)
    # SiLU sites: stem + last + per-block (dw + se-reduce [+ expand])
    assert sum(l.fn_name == "silu" for l in acts) == (
        2 + 2 * len(B0_BLOCKS) + sum(t != 1 for _, _, t, *_ in B0_BLOCKS))
    assert sum(l.fn_name == "sigmoid" for l in acts) == len(B0_BLOCKS)
