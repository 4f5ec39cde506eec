"""QuantEmbed + BERT-style text encoder tests (NLP INT8 path)."""

import numpy as np
import pytest
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models
from int8inferenceengine_tpu.layers import QuantEmbed
from int8inferenceengine_tpu.ops import functional as F
from int8inferenceengine_tpu.ops import quant as quant_ops


def _ids(shape, vocab=1000, seed=0):
    return np.random.default_rng(seed).integers(0, vocab, shape) \
        .astype(np.float32)


def test_embed_fp32_matches_torch():
    torch.manual_seed(0)
    te = torch.nn.Embedding(50, 16)
    e = QuantEmbed(50, 16)
    e.load_weight(te.weight.detach().numpy())
    ids = _ids((4, 7), vocab=50)
    got = e(q.tensor(ids)).numpy()
    want = te(torch.tensor(ids).long()).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
    with pytest.raises(ValueError, match="no bias"):
        e.load_bias(np.zeros(16, np.float32))


def test_embed_int8_is_quantized_table_gather():
    """After convert, the INT8 path must equal quantize(table)[ids] exactly
    (the table is quantized once; the gather does no float work)."""
    rng = np.random.default_rng(1)
    table = rng.normal(0, 0.5, (50, 16)).astype(np.float32)
    e = QuantEmbed(50, 16)
    e.load_weight(table)
    e.prepare()
    ids = _ids((8, 5), vocab=50, seed=2)
    e(q.tensor(ids))
    e.convert()
    out = e(q.tensor(ids))
    assert out.quantized and (out.scale, out.zero_point) == (
        e.scale, e.zero_point)
    import jax.numpy as jnp
    want = np.asarray(quant_ops.quantize_u8(
        jnp.asarray(table), e.scale, e.zero_point))[ids.astype(int)]
    np.testing.assert_array_equal(np.asarray(out.data), want)
    with pytest.raises(ValueError, match="raw token ids"):
        e(F.quantize(q.tensor(ids), 1.0, 0))


def test_embed_range_covers_unseen_tokens():
    """convert() must widen the calibrated range to the FULL table, so
    tokens unseen during calibration don't clip."""
    table = np.zeros((10, 4), np.float32)
    table[:5] = 0.1          # the only rows seen during calibration
    table[7] = 3.0           # unseen, far outside the observed range
    e = QuantEmbed(10, 4)
    e.load_weight(table)
    e.prepare()
    e(q.tensor(np.zeros((2, 3), np.float32)))   # only token 0 observed
    e.convert()
    out = F.dequantize(e(q.tensor(np.full((1, 1), 7, np.float32)))).numpy()
    np.testing.assert_allclose(out, 3.0, atol=2 * e.scale)


def test_embed_out_of_vocab_ids_clamped():
    """Out-of-range / negative ids clamp to the table edges instead of
    wrapping or producing NaN (jnp.take's raw semantics)."""
    rng = np.random.default_rng(0)
    e = QuantEmbed(10, 4)
    e.load_weight(rng.normal(0, 1, (10, 4)).astype(np.float32))
    bad = np.array([[-3, 99, 5]], np.float32)
    out = e(q.tensor(bad)).numpy()
    assert np.isfinite(out).all()
    table = np.asarray(e.params["weight"])
    np.testing.assert_allclose(out[0, 0], table[0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], table[9], atol=1e-6)


def test_text_transformer_ptq_lifecycle():
    torch.set_num_threads(1)
    kw = dict(vocab_size=200, max_len=16, dim=64, depth=2, heads=2,
              mlp_ratio=2)
    tm = models.torch_text_transformer(**kw)
    mm = models.TextTransformer(**kw)
    mm.load(tm.state_dict())
    ids = _ids((32, 16), vocab=200, seed=0)
    ref = tm(torch.tensor(ids)).detach().numpy()
    out = mm(q.tensor(ids)).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-4)
    mm.prepare()
    mm(q.tensor(_ids((16, 16), vocab=200, seed=1)))
    mm.convert()
    qo = mm(q.tensor(ids)).numpy()
    assert qo.shape == ref.shape and np.isfinite(qo).all()
    agree = (qo.argmax(1) == ref.argmax(1)).mean()
    assert agree >= 0.7, agree


def test_text_registry():
    mm = models.build("text_tiny", vocab_size=100, max_len=8, dim=32,
                      depth=1, heads=2)
    assert mm.INPUT_SHAPE == (8,)
    assert mm._consumes_ids()
