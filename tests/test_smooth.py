"""SmoothQuant-style smoothing (utils.smooth): FP32-invariant, and it
rescues per-tensor INT8 accuracy when LN outputs have outlier channels."""

import numpy as np
import jax.numpy as jnp

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models, utils


def _ids(b, t, seed=0):
    return np.random.default_rng(seed).integers(
        0, 1000, size=(b, t)).astype(np.int32)


def _outlier_model():
    """text_tiny rewritten into the activation-outlier regime smoothing
    targets: a few LN channels scaled 30x hot with the consumer weight
    columns scaled 1/30 — the FP32 function is IDENTICAL to the balanced
    original, but per-tensor activation quantization now starves every
    non-hot channel of codes (the LLM outlier phenomenon in miniature)."""
    m = models.build("text_tiny")
    m.load(models.torch_twin("text_tiny").state_dict())
    layers = dict(m.named_layers())
    rng = np.random.default_rng(5)
    for ln_name, lin_names in utils.transformer_smooth_pairs(m):
        ln = layers[ln_name]
        g = np.array(ln.params["weight"])
        b = np.array(ln.params["bias"])
        hot = rng.choice(g.shape[0], 4, replace=False)
        g[hot] *= 30.0
        b[hot] *= 30.0
        ln.params["weight"] = jnp.asarray(g)
        ln.params["bias"] = jnp.asarray(b)
        for n in lin_names:
            w = np.array(layers[n].params["weight"])
            w[:, hot] /= 30.0
            layers[n].params["weight"] = jnp.asarray(w)
    return m


def test_fp32_invariance():
    ids = _ids(8, 64, 1)
    m1, m2 = _outlier_model(), _outlier_model()
    want = m1(q.tensor(ids)).numpy()
    utils.smooth(m2, utils.transformer_smooth_pairs(m2), ids)
    got = m2(q.tensor(ids)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_int8_error_drops_on_outliers():
    ids_c = _ids(8, 64, 2)
    ids_t = _ids(8, 64, 3)
    mse = {}
    for smoothed in (False, True):
        m = _outlier_model()
        want = m(q.tensor(ids_t)).numpy()        # this model's own FP32
        if smoothed:
            utils.smooth(m, utils.transformer_smooth_pairs(m), ids_c)
        m.prepare()
        m(q.tensor(ids_c))
        m.convert()
        got = m(q.tensor(ids_t)).numpy()
        mse[smoothed] = float(np.mean((got - want) ** 2))
    assert mse[True] < mse[False] * 0.6, mse


def test_guards():
    m = _outlier_model()
    ids = _ids(4, 64, 4)
    m.prepare()
    try:
        utils.smooth(m, utils.transformer_smooth_pairs(m), ids)
        assert False, "expected RuntimeError after prepare()"
    except RuntimeError:
        pass


def test_all_levers_compose_on_transformer():
    """smooth -> prepare/calibrate -> adaround -> convert, with
    per-channel + nearest + bias correction: the full accuracy stack must
    compose without interference and still track the model's own FP32."""
    from int8inferenceengine_tpu import QuantConfig
    m = models.build("text_tiny", config=QuantConfig(
        weight_per_channel=True, rounding="nearest", bias_correction=True))
    m.load(models.torch_twin("text_tiny").state_dict())
    ids_c, ids_t = _ids(8, 64, 11), _ids(8, 64, 12)
    want = m(q.tensor(ids_t)).numpy()
    utils.smooth(m, utils.transformer_smooth_pairs(m), ids_c)
    m.prepare()
    m(q.tensor(ids_c))
    utils.adaround(m, ids_c, iters=60)
    m.convert()
    got = m(q.tensor(ids_t)).numpy()
    assert np.isfinite(got).all()
    agree = (got[:, -1].argmax(-1) == want[:, -1].argmax(-1)).mean()
    assert agree >= 0.75, agree
