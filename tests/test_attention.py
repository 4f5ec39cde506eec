"""Fused INT8 attention (ops/attention.py): the Pallas kernel (interpret
mode) and the composed-XLA oracle must agree; the oracle must be
bit-identical to the per-layer QuantMatmul/QuantSoftmax chain; models
gated by QuantConfig.fused_attention must produce identical results
either way."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models
from int8inferenceengine_tpu.ops import attention as A
from int8inferenceengine_tpu.ops import quant as quant_ops
from int8inferenceengine_tpu.ops.qmatmul import qmatmul_act


def _codes(shape, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=shape, dtype=np.uint8)


_SCALES = dict(scale_q=0.031, zp_q=121, scale_k=0.028, zp_k=134,
               scale_v=0.05, zp_v=97, scale_s=0.04, zp_s=128,
               scale_p=1 / 255.0, zp_p=0, scale_c=0.045, zp_c=110)


def test_oracle_matches_layer_chain():
    """attention_xla == QuantMatmul -> QuantSoftmax -> QuantMatmul math."""
    b, h, t, d = 2, 3, 37, 16
    qh, kh, vh = (jnp.asarray(_codes((b, h, t, d), s)) for s in (0, 1, 2))
    kw = _SCALES
    alpha = d ** -0.5
    s = qmatmul_act(qh, kh, scale_a=kw["scale_q"], zp_a=kw["zp_q"],
                    scale_b=kw["scale_k"], zp_b=kw["zp_k"],
                    scale_c=kw["scale_s"], zp_c=kw["zp_s"], alpha=alpha,
                    transpose_b=True)
    f = quant_ops.dequantize_u8(s, kw["scale_s"], kw["zp_s"])
    p = quant_ops.quantize_u8(jax.nn.softmax(f, axis=-1),
                              kw["scale_p"], kw["zp_p"])
    want = qmatmul_act(p, vh, scale_a=kw["scale_p"], zp_a=kw["zp_p"],
                       scale_b=kw["scale_v"], zp_b=kw["zp_v"],
                       scale_c=kw["scale_c"], zp_c=kw["zp_c"])
    got = A.attention_xla(qh, kh, vh, alpha=alpha, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("t,d", [(197, 64), (128, 128), (50, 32)])
@pytest.mark.parametrize("rounding", ["trunc", "nearest"])
def test_pallas_interpret_matches_xla(t, d, rounding):
    """Kernel vs oracle: padding, masking and zero-point math must agree.

    exp() in interpret mode is the same XLA CPU exp as the oracle's, so
    intermediate codes should be bit-equal; allow +-1 code for float
    associativity differences in the masked softmax reductions."""
    b, h = 2, 2
    qh, kh, vh = (jnp.asarray(_codes((b, h, t, d), s + 3))
                  for s in range(3))
    kw = dict(_SCALES, alpha=d ** -0.5, rounding=rounding)
    want = np.asarray(A.attention_xla(qh, kh, vh, **kw)).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(A.attention_pallas(qh, kh, vh, **kw)
                         ).astype(np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= 1, (diff.max(), (diff > 0).mean())
    assert (diff == 0).mean() > 0.99


def test_pallas_extreme_zero_points():
    """zp at the grid edges exercises the correction terms hardest."""
    t, d = 197, 64
    qh, kh, vh = (jnp.asarray(_codes((1, 2, t, d), s + 9))
                  for s in range(3))
    kw = dict(_SCALES, zp_q=0, zp_k=255, zp_v=1, zp_p=3, alpha=0.125)
    want = np.asarray(A.attention_xla(qh, kh, vh, **kw)).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(A.attention_pallas(qh, kh, vh, **kw)
                         ).astype(np.int32)
    assert np.abs(got - want).max() <= 1


@pytest.mark.parametrize("name", ["text_tiny"])
def test_model_fused_flag_equivalent(name):
    """fused_attention='xla' must equal 'off' bit-for-bit on any backend
    (same composed math, different code path)."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1000, size=(8, 64)).astype(np.int32)
    outs = {}
    for mode in ("off", "xla"):
        m = models.build(name, config=QuantConfig(fused_attention=mode))
        m.load(models.torch_twin(name).state_dict())
        m.prepare()
        m(q.tensor(x))
        m.convert()
        outs[mode] = m(q.tensor(x)).numpy()
    np.testing.assert_array_equal(outs["off"], outs["xla"])


def test_model_fused_pallas_interpret():
    """Full ViT-shaped model through the interpret-mode kernel."""
    from int8inferenceengine_tpu.models.vit import torch_vit
    m = models.build("vit_tiny", config=QuantConfig(
        fused_attention="pallas"), img_size=32, patch=16, depth=1)
    mo = models.build("vit_tiny", config=QuantConfig(
        fused_attention="off"), img_size=32, patch=16, depth=1)
    tw = torch_vit(img_size=32, patch=16, depth=1)
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(4, 3, 32, 32)).astype(np.float32)
    for mm in (m, mo):
        mm.load(tw.state_dict())
        mm.prepare()
        mm(q.tensor(x))
        mm.convert()
    with pltpu.force_tpu_interpret_mode():
        got = m(q.tensor(x)).numpy()
    want = mo(q.tensor(x)).numpy()
    # one fused block; +-1 intermediate code tolerance at the model head
    assert np.abs(got - want).max() <= np.float32(
        2 * m.head.scale), (got - want)
