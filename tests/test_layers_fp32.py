"""FP32 layer numerics vs the torch oracle
(reference: unittest/test_layers.py, atol 0.1)."""

import numpy as np
import torch
import torch.nn as nn

import int8inferenceengine_tpu as q


def test_linear_vs_torch():
    torch.manual_seed(0)
    tl = nn.Linear(800, 500)
    layer = q.Linear(800, 500)
    layer.load_weight(tl.weight)
    layer.load_bias(tl.bias)
    x = np.random.uniform(-2, 2, (10, 800)).astype(np.float32)
    ref = tl(torch.tensor(x)).detach().numpy()
    out = layer(q.tensor(x)).numpy()
    np.testing.assert_allclose(out, ref, atol=0.1)


def test_conv2d_vs_torch_configs():
    torch.manual_seed(0)
    configs = [
        dict(in_c=1, out_c=20, k=5, stride=1, padding=0, hw=28),
        dict(in_c=3, out_c=8, k=3, stride=1, padding=1, hw=16),
        dict(in_c=3, out_c=8, k=11, stride=7, padding=3, hw=32),
        dict(in_c=3, out_c=96, k=11, stride=4, padding=2, hw=224),
    ]
    for cfg in configs:
        tl = nn.Conv2d(cfg["in_c"], cfg["out_c"], cfg["k"],
                       stride=cfg["stride"], padding=cfg["padding"])
        layer = q.Conv2d(cfg["in_c"], cfg["out_c"], cfg["k"],
                         stride=cfg["stride"], padding=cfg["padding"])
        layer.load_weight(tl.weight)
        layer.load_bias(tl.bias)
        x = np.random.uniform(-2, 2, (2, cfg["in_c"], cfg["hw"], cfg["hw"])
                              ).astype(np.float32)
        ref = tl(torch.tensor(x)).detach().numpy()
        out = layer(q.tensor(x)).numpy()
        assert out.shape == ref.shape, cfg
        np.testing.assert_allclose(out, ref, atol=0.1)


def test_load_shape_validation():
    layer = q.Linear(8, 4)
    try:
        layer.load_weight(np.zeros((4, 9), np.float32))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
