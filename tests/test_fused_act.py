"""Fused Linear+QuantAct epilogue (ops/gemm_int8 act=, layers.fused_linear_act):
the XLA backend must be bit-identical to the composed pair; the Pallas
kernel must match within one code (erf approximated in-kernel, _erf)."""

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models
from int8inferenceengine_tpu.layers import Linear, QuantAct, fused_linear_act
from int8inferenceengine_tpu.ops.gemm_int8 import (KERNEL_ACTS,
                                                   compute_offset,
                                                   qgemm_pallas, qgemm_xla)


def _gemm_args(m=64, k=192, n=96, seed=0):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.integers(0, 256, (m, k), dtype=np.uint8))
    w = jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))
    qb = jnp.asarray(rng.integers(-127, 128, (n,), dtype=np.int8))
    kw = dict(scale_a=0.025, zp_a=127, scale_w=0.01, scale_c=0.05, zp_c=99)
    oc = compute_offset(qb, jnp.sum(w.astype(jnp.int32), 0),
                        scale_a=kw["scale_a"], zp_a=kw["zp_a"],
                        recentered=True)
    return a, w, oc, kw


@pytest.mark.parametrize("fn", sorted(KERNEL_ACTS))
def test_pallas_act_epilogue_matches_xla(fn):
    a, w, oc, kw = _gemm_args()
    act = (fn, 0.02, 7)
    want = np.asarray(qgemm_xla(a, w, oc, act=act, **kw)).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(qgemm_pallas(a, w, oc, act=act, **kw)
                         ).astype(np.int32)
    diff = np.abs(got - want)
    if fn in ("relu", "relu6", "hardsigmoid", "hardswish"):
        assert diff.max() == 0, diff.max()
    else:                        # transcendental approximations: +-1 code
        assert diff.max() <= 1, diff.max()
        assert (diff == 0).mean() > 0.99


def test_xla_act_equals_composed_pair():
    """qgemm_xla(act=) == Linear followed by QuantAct, bit-for-bit."""
    rng = np.random.default_rng(3)
    wf = rng.normal(0, 0.2, (48, 64)).astype(np.float32)
    bf = rng.normal(0, 0.1, 48).astype(np.float32)
    x = rng.uniform(-1, 1, (32, 64)).astype(np.float32)
    lin = Linear(64, 48)
    lin.load_weight(wf)
    lin.load_bias(bf)
    act = QuantAct("gelu")
    for l in (lin, act):
        l.prepare()
    act(lin(q.tensor(x)))
    for l in (lin, act):
        l.convert()
    from int8inferenceengine_tpu.ops import functional as F
    qx = F.quantize(q.tensor(x), 1 / 64.0, 128)
    want = act(lin(qx))
    got = fused_linear_act(lin, act, qx)
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(want.data))
    assert got.scale == want.scale and got.zero_point == want.zero_point


def test_model_fuse_flag_equivalent():
    """text_tiny fuse_linear_act True == False bit-for-bit on CPU (both
    run the XLA backend; the fused epilogue replays the same grid)."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1000, size=(8, 64)).astype(np.int32)
    outs = {}
    for flag in (False, True):
        m = models.build("text_tiny",
                         config=QuantConfig(fuse_linear_act=flag))
        m.load(models.torch_twin("text_tiny").state_dict())
        m.prepare()
        m(q.tensor(x))
        m.convert()
        outs[flag] = m(q.tensor(x)).numpy()
    np.testing.assert_array_equal(outs[False], outs[True])


def test_fused_act_respects_quant_fallback_island():
    """convert(skip=fc1) on a transformer must NOT fuse the gelu into the
    (now FP32-island) fc1 — the composed path must run, bit-identical to
    fuse_linear_act=False."""
    import numpy as np
    from int8inferenceengine_tpu import models
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, (4, 64)).astype(np.int32)
    outs = {}
    for fuse in (False, True):
        m = models.build("text_tiny",
                         config=QuantConfig(fuse_linear_act=fuse))
        m.load(models.torch_twin("text_tiny").state_dict())
        m.prepare()
        m(q.tensor(ids))
        m.convert(skip=("fc1_1",))
        outs[fuse] = m(q.tensor(ids)).numpy()
    np.testing.assert_array_equal(outs[False], outs[True])


def test_fused_act_rejects_custom_fn_name_collision():
    """A custom callable named like a built-in must fall back to the
    composed pair (the kernel would replay the wrong formula)."""
    import jax
    import numpy as np
    rng = np.random.default_rng(1)
    w = rng.normal(0, 0.2, (32, 64)).astype(np.float32)
    x = rng.uniform(-1, 1, (64, 64)).astype(np.float32)
    lin = Linear(64, 32)
    lin.load_weight(w)
    lin.load_bias(np.zeros(32, np.float32))
    act = QuantAct(lambda z: jax.nn.gelu(z, approximate=True))
    act.fn_name = "gelu"                  # adversarial name collision
    for l in (lin, act):
        l.prepare()
    act(lin(q.tensor(x)))
    for l in (lin, act):
        l.convert()
    from int8inferenceengine_tpu.ops import functional as F
    qx = F.quantize(q.tensor(x), 1 / 64.0, 128)
    want = act(lin(qx))                   # composed (tanh-approx gelu)
    got = fused_linear_act(lin, act, qx)  # must NOT fuse
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(want.data))
