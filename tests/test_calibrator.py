"""Calibrator scale/zero-point derivation (reference: src/calibrator.cc:24-37)."""

import jax.numpy as jnp
import numpy as np

from int8inferenceengine_tpu.calibrator import Calibrator


def _reference_formula(lo, hi):
    lo = np.float32(min(lo, 0.0))
    hi = np.float32(max(hi, 0.0))
    zp = int(np.float32(255.0) * (0.0 - lo) / (hi - lo + np.float32(1e-9)))
    scale = (hi - lo) / np.float32(255.0) if zp == 0 else (0.0 - lo) / np.float32(zp)
    if scale == 0:
        scale = 1.0
    return float(scale), zp


def test_minmax_formula_spanning_zero():
    cal = Calibrator()
    data = jnp.asarray(np.array([-1.5, 0.2, 3.7, 2.0], np.float32))
    cal.sample(data)
    s, zp = cal.get_range(1.0)
    rs, rzp = _reference_formula(-1.5, 3.7)
    assert zp == rzp
    np.testing.assert_allclose(s, rs, rtol=1e-6)


def test_all_positive_gives_zp_zero():
    cal = Calibrator()
    cal.sample(jnp.asarray(np.array([0.5, 2.0, 10.0], np.float32)))
    s, zp = cal.get_range(1.0)
    assert zp == 0
    np.testing.assert_allclose(s, 10.0 / np.float32(255.0), rtol=1e-6)


def test_all_negative_gives_zp_255ish():
    cal = Calibrator()
    cal.sample(jnp.asarray(np.array([-4.0, -1.0], np.float32)))
    s, zp = cal.get_range(1.0)
    rs, rzp = _reference_formula(-4.0, 0.0)
    assert zp == rzp
    np.testing.assert_allclose(s, rs, rtol=1e-6)


def test_unsampled_defaults():
    cal = Calibrator()
    assert cal.get_range(1.0) == (1.0, 0)


def test_streaming_accumulation():
    cal = Calibrator()
    cal.sample(jnp.asarray(np.array([1.0, 2.0], np.float32)))
    cal.sample(jnp.asarray(np.array([-5.0, 0.5], np.float32)))
    s, zp = cal.get_range(1.0)
    rs, rzp = _reference_formula(-5.0, 2.0)
    assert (s, zp) == (rs, rzp)


def test_reservoir_quantile_mode():
    cal = Calibrator(exact_minmax=False, reservoir_size=1000)
    vals = np.linspace(-10, 10, 5000).astype(np.float32)
    cal.sample(jnp.asarray(vals))
    s, zp = cal.get_range(0.99)
    # trimmed range must be inside the full range
    assert 0 < s < 20.0 / 127
    assert 0 < zp < 255


def test_jitted_calibration_multiple_batch_shapes():
    """The jitted calibration path retraces per input shape and must merge
    ranges across differently-shaped batches (Module._calib_meta keyed by
    shape)."""
    import int8inferenceengine_tpu as q
    from int8inferenceengine_tpu import models

    mm = models.build("fc_mnist")
    rng = np.random.default_rng(0)
    mm.fc1.load_weight(np.float32(rng.normal(0, 0.1, (10, 784))))
    mm.fc1.load_bias(np.float32(rng.normal(0, 0.1, 10)))
    mm.prepare()
    b1 = np.float32(rng.uniform(-1, 1, (8, 784)))
    b2 = np.float32(rng.uniform(-3, 3, (16, 784)))   # different shape+range
    mm(q.tensor(b1))
    mm(q.tensor(b2))
    cal = mm.fc1.calibrator
    assert cal._count == 8 * 10 + 16 * 10
    out1 = b1 @ np.float32(rng.normal(0, 0.1, (10, 784))).T  # not the real W
    # The observed range must cover BOTH batches' true outputs.
    w = np.asarray(mm.fc1.params["weight"])
    b = np.asarray(mm.fc1.params["bias"])
    true_all = np.concatenate([b1 @ w.T + b, b2 @ w.T + b])
    assert float(np.float32(cal._min)) <= true_all.min() + 1e-5
    assert float(np.float32(cal._max)) >= true_all.max() - 1e-5
    mm.convert()
    assert mm.fc1.scale > 0
