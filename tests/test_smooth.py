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


def _llama_outlier_model(config=None):
    """llama_tiny pushed into the outlier regime on its RMSNorm gammas
    (the real-llama SmoothQuant scenario): hot channels on every
    norm -> Linear boundary, FP32 function unchanged."""
    from int8inferenceengine_tpu import QuantConfig
    m = models.build("llama_tiny", config=config or QuantConfig(
        rounding="nearest"))
    m.load(models.torch_twin("llama_tiny").state_dict())
    layers = dict(m.named_layers())
    rng = np.random.default_rng(6)
    for ln_name, lin_names in utils.transformer_smooth_pairs(m):
        ln = layers[ln_name]
        g = np.array(ln.params["weight"])
        hot = rng.choice(g.shape[0], 4, replace=False)
        g[hot] *= 30.0
        ln.params["weight"] = jnp.asarray(g)
        for n in lin_names:
            w = np.array(layers[n].params["weight"])
            w[:, hot] /= 30.0
            layers[n].params["weight"] = jnp.asarray(w)
    return m


def test_llama_rmsnorm_smoothing():
    """RMSNorm -> {wq,wk,wv} / {gate,up} / head smoothing: FP32-invariant
    (gamma fold is exact — mean(x^2) is computed before gamma), and it
    rescues per-tensor INT8 logit error in the outlier regime."""
    ids_c, ids_t = _ids(8, 64, 21), _ids(16, 32, 22)

    base = _llama_outlier_model()
    want = base(q.tensor(ids_t)).numpy()

    sm = _llama_outlier_model()
    utils.smooth(sm, utils.transformer_smooth_pairs(sm), ids_c)
    got_fp = sm(q.tensor(ids_t)).numpy()
    assert np.abs(got_fp - want).max() < 2e-4   # FP32 invariance

    def int8_err(m):
        m.prepare(); m(q.tensor(ids_c)); m.convert()
        got = m(q.tensor(ids_t)).numpy()
        return float(np.sqrt(((got[:, -1] - want[:, -1]) ** 2).mean()))

    e_plain = int8_err(_llama_outlier_model())
    sm2 = _llama_outlier_model()
    utils.smooth(sm2, utils.transformer_smooth_pairs(sm2), ids_c)
    e_smooth = int8_err(sm2)
    assert e_smooth < 0.5 * e_plain, (e_plain, e_smooth)


def test_gemma_unit_offset_fp32_invariance():
    """smooth() on gemma's unit-offset RMSNorms must leave the FP32
    forward invariant: the fold is (1 + w') = (1 + w)/s, not w/s
    (the naive fold cost 5x perplexity on the trained-gemma harness)."""
    import numpy as np
    from int8inferenceengine_tpu import models, tensor
    from int8inferenceengine_tpu.config import QuantConfig
    from int8inferenceengine_tpu.utils import (smooth,
                                               transformer_smooth_pairs)
    from __graft_entry__ import _load_random_weights
    rng = np.random.default_rng(0)
    m = models.build("gemma_tiny", vocab_size=61, max_len=32, dim=64,
                     depth=2, heads=4, kv_heads=2,
                     config=QuantConfig(rounding="nearest"))
    _load_random_weights(m)
    ids = rng.integers(0, 61, (2, 12)).astype(np.int32)
    want = np.asarray(m(tensor(ids)).data)
    smooth(m, transformer_smooth_pairs(m), ids)
    got = np.asarray(m(tensor(ids)).data)
    assert abs(got - want).max() < 1e-4, abs(got - want).max()
