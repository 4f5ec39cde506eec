"""MSE calibration (QuantConfig(calib_method='mse')): a can-only-help
safeguard at 8 bits — the search evaluates the reservoir PLUS the tracked
population extremes, so it never over-clips rare outliers; at 8-bit
resolution minmax is already near-MSE-optimal for most distributions (the
real range-search wins live at 4 bits, ops/w4.py)."""

import numpy as np
import jax.numpy as jnp

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig
from int8inferenceengine_tpu.calibrator import Calibrator
from int8inferenceengine_tpu.layers import Linear


def _recon_err(vals, scale, zp):
    t = np.clip(vals / np.float32(scale) + zp, 0, 255)
    return float(np.mean(((np.trunc(t) - zp) * np.float32(scale)
                          - vals) ** 2))


def test_mse_never_materially_worse():
    """Across tail severities, the MSE choice tracks minmax within a few
    percent on the full population (the extreme-inclusive estimator keeps
    it from over-clipping on subsampled heavy tails)."""
    for sigma in (0.5, 1.0, 1.6):
        rng = np.random.default_rng(0)
        vals = np.exp(rng.normal(0, sigma, 4000)).astype(np.float32)
        c_mm, c_mse = Calibrator(), Calibrator(method="mse")
        for c in (c_mm, c_mse):
            c.sample(jnp.asarray(vals))
        e_mm = _recon_err(vals, *c_mm.get_range())
        e_mse = _recon_err(vals, *c_mse.get_range())
        assert e_mse <= e_mm * 1.10, (sigma, e_mse, e_mm)


def test_mse_is_conservative_on_thin_tails():
    """The estimator weights the tracked extremes at reservoir mass
    (~1e-3), so it deliberately refuses aggressive clips it cannot verify
    — a subsampled objective that clipped rare outliers it never saw
    would silently corrupt them (this is the bias the extreme-inclusive
    estimator exists to prevent)."""
    rng = np.random.default_rng(1)
    vals = rng.uniform(0, 1, 200_000).astype(np.float32)
    vals[:2] = 400.0
    rng.shuffle(vals)
    c_mse = Calibrator(method="mse")
    c_mse.sample(jnp.asarray(vals))
    s_mse, _ = c_mse.get_range()
    assert s_mse > (400.0 / 255.0) * 0.5     # the 400s stay representable


def test_layer_lifecycle_with_mse():
    """calib_method='mse' runs through the normal prepare/convert path
    (eager calibration) and serves quantized inputs."""
    rng = np.random.default_rng(2)
    w = rng.normal(0, 0.2, (32, 64)).astype(np.float32)
    layer = Linear(64, 32, config=QuantConfig(calib_method="mse"))
    layer.load_weight(w)
    layer.load_bias(np.zeros(32, np.float32))
    layer.prepare()
    x = rng.normal(0, 1, (256, 64)).astype(np.float32)
    ref = layer(q.tensor(x)).numpy()
    layer.convert()
    from int8inferenceengine_tpu.ops import functional as F
    qx = F.quantize(q.tensor(x), 1 / 32.0, 128)
    got = F.dequantize(layer(qx)).numpy()
    assert np.isfinite(got).all()
    assert np.mean((got - ref) ** 2) < 1e-2
