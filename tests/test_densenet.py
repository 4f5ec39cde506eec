"""DenseNet-121 differential tests: deep QuantConcat chains."""

import numpy as np
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models
from int8inferenceengine_tpu.layers import QuantConcat
from int8inferenceengine_tpu.models.densenet import DENSENET121_BLOCKS


def _rand(shape):
    return np.random.uniform(-1, 1, size=shape).astype(np.float32)


def test_densenet121_structure():
    mm = models.build("densenet121")
    names = [n for n, _ in mm.named_layers()]
    n_dense = sum(DENSENET121_BLOCKS)
    # stem + 2 convs per dense layer + 3 transitions + fc, one cat per layer
    assert sum("c1" in n or "c2" in n for n in names) == 2 * n_dense
    assert sum(n.endswith("cat") for n in names) == n_dense
    assert {"conv0", "t1", "t2", "t3", "fc"} <= set(names)
    tm = models.torch_twin("densenet121")
    twin_layers = {k.rsplit(".", 1)[0] for k in tm.state_dict()}
    weighted = {n for n, l in mm.named_layers()
                if not isinstance(l, QuantConcat)}
    assert twin_layers == weighted


def test_densenet121_ptq_lifecycle():
    """FP32 parity vs the twin, then INT8 through 58 calibrated concat
    requant boundaries stays sane (reduced 64x64 spatial; adaptive pool)."""
    torch.set_num_threads(1)
    np.random.seed(0)
    tm = models.torch_twin("densenet121")
    mm = models.build("densenet121")
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
    cats = [l for _, l in mm.named_layers() if isinstance(l, QuantConcat)]
    assert len(cats) == sum(DENSENET121_BLOCKS)
    assert all(l.is_quantized for l in cats)
