"""Cross-layer equalization: FP32 invariance + per-tensor INT8 error win."""

import numpy as np
import pytest
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models, utils
from int8inferenceengine_tpu.layers import Linear
from int8inferenceengine_tpu.module import Module


def _rand(shape):
    return np.random.uniform(-1, 1, size=shape).astype(np.float32)


def test_fp32_invariance_lenet():
    """Equalizing conv1->conv2 (pool between) and fc1->fc2 (relu between)
    leaves the FP32 function unchanged up to float rounding."""
    torch.set_num_threads(1)
    np.random.seed(0)
    tm = models.torch_twin("lenet")
    mm = models.build("lenet")
    mm.load(tm.state_dict())
    x = _rand((8, 1, 28, 28))
    before = mm(q.tensor(x)).numpy()
    utils.cross_layer_equalize(mm, [("conv1", "conv2"), ("fc1", "fc2")])
    after = mm(q.tensor(x)).numpy()
    np.testing.assert_allclose(after, before, atol=1e-4)


def test_ranges_equalized():
    """After CLE the producer's out-channel ranges equal the consumer's
    in-channel ranges (the paper's fixed point)."""
    import jax.numpy as jnp
    np.random.seed(1)
    mm = models.build("lenet")
    tm = models.torch_twin("lenet")
    mm.load(tm.state_dict())
    utils.cross_layer_equalize(mm, [("fc1", "fc2")], iterations=1)
    wa = mm.fc1.params["weight"]   # [out, in]
    wb = mm.fc2.params["weight"]
    r1 = jnp.max(jnp.abs(wa), axis=1)
    r2 = jnp.max(jnp.abs(wb), axis=0)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-5)


class _Pathological(Module):
    """fc1 with one 300x-range output channel — the per-tensor worst case."""

    def __init__(self):
        super().__init__()
        self.fc1 = Linear(32, 32)
        self.fc2 = Linear(32, 8)

    def forward(self, x):
        from int8inferenceengine_tpu.ops import functional as F
        return self.fc2(F.relu(self.fc1(x)))


def _build_pathological(seed=0):
    rng = np.random.default_rng(seed)
    m = _Pathological()
    w1 = rng.normal(0, 0.3, (32, 32)).astype(np.float32)
    w1[5] *= 300.0                        # one dominating channel
    w2 = rng.normal(0, 0.3, (8, 32)).astype(np.float32)
    w2[:, 5] /= 300.0                     # consumer compensates
    m.fc1.load_weight(w1)
    m.fc1.load_bias(np.zeros(32, np.float32))
    m.fc2.load_weight(w2)
    m.fc2.load_bias(np.zeros(8, np.float32))
    return m


def _int8_err(m, x, calib, ref):
    m.prepare()
    m(q.tensor(calib))
    m.convert()
    out = m(q.tensor(x)).numpy()
    return np.abs(out - ref).mean()


def test_per_tensor_int8_error_shrinks():
    np.random.seed(2)
    x = _rand((64, 32))
    calib = _rand((64, 32))
    ref = _build_pathological()(q.tensor(x)).numpy()

    err_plain = _int8_err(_build_pathological(), x, calib, ref)
    m_eq = _build_pathological()
    utils.cross_layer_equalize(m_eq, [("fc1", "fc2")])
    err_eq = _int8_err(m_eq, x, calib, ref)
    # the dominating channel wrecks the joint per-tensor scale; CLE fixes it
    assert err_eq < 0.5 * err_plain, (err_plain, err_eq)


def test_guards():
    mm = models.build("lenet")
    tm = models.torch_twin("lenet")
    mm.load(tm.state_dict())
    with pytest.raises(KeyError, match="no layer"):
        utils.cross_layer_equalize(mm, [("conv1", "nope")])
    with pytest.raises(ValueError, match="out=.*!=.*in"):
        utils.cross_layer_equalize(mm, [("conv1", "fc1")])
    mm.prepare()
    with pytest.raises(RuntimeError, match="before prepare"):
        utils.cross_layer_equalize(mm, [("conv1", "conv2")])
    mm(q.tensor(_rand((4, 1, 28, 28))))
    mm.convert()
    with pytest.raises(RuntimeError, match="before convert"):
        utils.cross_layer_equalize(mm, [("conv1", "conv2")])
