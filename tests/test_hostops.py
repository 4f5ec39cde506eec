"""Native hostops: C++ vs numpy-fallback equivalence + quant semantics."""

import numpy as np
import pytest

from int8inferenceengine_tpu import native


def test_native_builds():
    assert native.available(), "native hostops should compile on this host"


def test_quantize_matches_device_semantics():
    x = np.random.uniform(-10, 10, (3, 5, 7)).astype(np.float32)
    got = native.quantize_u8(x, 0.025, 127)
    want = np.clip(x / 0.025 + 127, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_quantize_extremes_clamp():
    x = np.array([1e9, -1e9, 0.0], np.float32)
    got = native.quantize_u8(x, 0.025, 127)
    np.testing.assert_array_equal(got, [255, 0, 127])


def test_dequantize_roundtrip():
    q = np.random.randint(0, 256, (64,), dtype=np.uint8)
    x = native.dequantize_u8(q, 0.1, 100)
    np.testing.assert_allclose(x, (q.astype(np.float32) - 100) * 0.1)


def test_normalize_nchw():
    img = np.random.randint(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    got = native.normalize_nchw(img, mean, std)
    want = ((img.astype(np.float32) / 255.0 - mean) / std).transpose(0, 3, 1, 2)
    assert got.shape == (2, 3, 8, 8)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_bilinear_vs_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    img = np.random.randint(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    got = native.resize_bilinear(img, 32, 32)
    t = torch.tensor(img.transpose(0, 3, 1, 2), dtype=torch.float32)
    want = F.interpolate(t, size=(32, 32), mode="bilinear",
                         align_corners=False)
    want = want.numpy().transpose(0, 2, 3, 1)
    # u8 rounding: allow off-by-one
    assert np.abs(got.astype(np.int32)
                  - (want + 0.5).astype(np.int32)).max() <= 1


def test_preprocess_quantize_fused_equals_two_step():
    img = np.random.randint(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    mean = np.array([0.5, 0.5, 0.5], np.float32)
    std = np.array([0.25, 0.25, 0.25], np.float32)
    fused = native.preprocess_quantize(img, mean, std, 0.025, 127)
    two_step = native.quantize_u8(
        native.normalize_nchw(img, mean, std), 0.025, 127)
    np.testing.assert_array_equal(fused, two_step)


def test_feeds_quantized_model_input():
    """u8 pipeline end-to-end: preprocess_quantize -> converted model."""
    import jax.numpy as jnp
    import int8inferenceengine_tpu as q
    from int8inferenceengine_tpu import models
    from int8inferenceengine_tpu.tensor import Tensor

    tm = models.torch_twin("lenet")
    mm = models.build("lenet")
    mm.load(tm.state_dict())
    mm.prepare()
    calib = np.random.uniform(-1, 1, (8, 1, 28, 28)).astype(np.float32)
    mm(q.tensor(calib))
    mm.convert()

    img = np.random.randint(0, 256, (4, 28, 28, 1), dtype=np.uint8)
    mean = np.array([0.5], np.float32)
    std = np.array([0.5], np.float32)
    cfg = mm.config
    qin = native.preprocess_quantize(img, mean, std, cfg.input_scale,
                                     cfg.input_zero_point)
    # f32 reference path through the same model
    f32 = native.normalize_nchw(img, mean, std)
    want = mm(q.tensor(f32)).numpy()

    out = mm.forward(Tensor(jnp.asarray(qin), cfg.input_scale,
                            cfg.input_zero_point))
    from int8inferenceengine_tpu.ops import functional as F
    got = F.dequantize(out).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_numpy_fallbacks_match_native(monkeypatch):
    """With the native library unavailable, every entry point must produce
    identical results via the numpy fallbacks."""
    assert native.available()
    img = np.random.randint(0, 256, (2, 9, 9, 3), dtype=np.uint8)
    x = np.random.uniform(-5, 5, (4, 7)).astype(np.float32)
    qv = np.random.randint(0, 256, (33,), dtype=np.uint8)
    mean = np.array([0.4, 0.5, 0.6], np.float32)
    std = np.array([0.2, 0.3, 0.25], np.float32)

    native_res = {
        "q": native.quantize_u8(x, 0.025, 127),
        "dq": native.dequantize_u8(qv, 0.1, 90),
        "norm": native.normalize_nchw(img, mean, std),
        "resize": native.resize_bilinear(img, 18, 18),
        "fused": native.preprocess_quantize(img, mean, std, 0.025, 127),
    }
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)   # force fallbacks
    fb = {
        "q": native.quantize_u8(x, 0.025, 127),
        "dq": native.dequantize_u8(qv, 0.1, 90),
        "norm": native.normalize_nchw(img, mean, std),
        "resize": native.resize_bilinear(img, 18, 18),
        "fused": native.preprocess_quantize(img, mean, std, 0.025, 127),
    }
    np.testing.assert_array_equal(fb["q"], native_res["q"])
    np.testing.assert_allclose(fb["dq"], native_res["dq"], rtol=1e-6)
    np.testing.assert_allclose(fb["norm"], native_res["norm"], atol=1e-5)
    assert np.abs(fb["resize"].astype(int)
                  - native_res["resize"].astype(int)).max() <= 1
    assert np.abs(fb["fused"].astype(int)
                  - native_res["fused"].astype(int)).max() <= 1


def test_s2d_quantized_native_matches_fallback(monkeypatch):
    from int8inferenceengine_tpu import native
    assert native.available()
    rng = np.random.default_rng(9)
    # AlexNet conv1 geometry (k11 s4 p2) at a reduced spatial size, plus a
    # slack case where hp exceeds the padded extent (k5 s3 p0 on 17).
    cases = [((4, 3, 32, 32), 11, 4, 2), ((2, 3, 17, 17), 5, 3, 0),
             ((2, 4, 16, 16), 5, 2, 2)]
    for shape, k, s, p in cases:
        q_in = rng.integers(0, 256, shape, dtype=np.uint8)
        got = native.s2d_quantized(q_in, k, s, p, 127)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
        want = native.s2d_quantized(q_in, k, s, p, 127)
        monkeypatch.undo()
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)
