"""Quantize/dequantize numerics (reference: unittest/test_quantization.py
plus direct checks of the quantize_utils.cc scalar-loop semantics)."""

import jax.numpy as jnp
import numpy as np

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu.ops import quant


def test_roundtrip_module_level():
    # Reference test: quantize at (0.025, 100), dequantize, atol 0.1
    # (unittest/test_quantization.py:10-17).
    x = np.random.uniform(-1, 1, (8, 16)).astype(np.float32)
    t = q.tensor(x)
    qt = q.quantize(t, 0.025, 100)
    assert qt.data.dtype == jnp.uint8
    assert qt.scale == 0.025 and qt.zero_point == 100
    d = q.dequantize(qt)
    np.testing.assert_allclose(d.numpy(), x, atol=0.1)


def test_quantize_u8_truncates_and_clamps():
    # C++ float->u8 conversion truncates toward zero; out-of-range clamps
    # (quantize_utils.cc:3-10).
    x = jnp.array([-10.0, 0.0, 0.9, 1.9, 300.0], jnp.float32)
    out = np.asarray(quant.quantize_u8(x, 1.0, 0))
    np.testing.assert_array_equal(out, [0, 0, 0, 1, 255])


def test_quantize_s8_symmetric():
    # quantize_utils.cc:12-19: clamp [-127, 127], trunc toward zero.
    x = jnp.array([-300.0, -1.7, 1.7, 300.0], jnp.float32)
    out = np.asarray(quant.quantize_s8(x, 1.0))
    np.testing.assert_array_equal(out, [-127, -1, 1, 127])


def test_down_scale_matches_scalar_loop():
    # Oracle: the reference's down_scale scalar loop (quantize_utils.cc:27-36)
    acc = np.random.randint(-100000, 100000, (64, 32)).astype(np.int32)
    sa, sw, sc, zp = 0.025, 0.011, 0.05, 97
    ref = np.empty(acc.shape, np.uint8)
    deq = acc.astype(np.float32) * np.float32(sa) * np.float32(sw)
    qv = deq / np.float32(sc) + np.float32(zp)
    ref = np.clip(qv, 0, 255).astype(np.uint8)
    out = np.asarray(quant.down_scale(jnp.asarray(acc), sa, sw, sc, zp))
    np.testing.assert_array_equal(out, ref)


def test_weight_joint_scale():
    # src/layer.cc:6-26: one scale (max-min)/127 over weight AND bias.
    w = np.random.uniform(-0.5, 0.8, (10, 20)).astype(np.float32)
    b = np.random.uniform(-0.1, 1.5, (10,)).astype(np.float32)
    q_w, q_b, s = quant.quantize_weight_joint_scale(jnp.asarray(w), jnp.asarray(b))
    lo = min(w.min(), b.min())
    hi = max(w.max(), b.max())
    np.testing.assert_allclose(s, (hi - lo) / 127, rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(q_w), np.clip(w / np.float32(s), -127, 127).astype(np.int8))
    np.testing.assert_array_equal(
        np.asarray(q_b), np.clip(b / np.float32(s), -127, 127).astype(np.int8))
