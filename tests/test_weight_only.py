"""Weight-only INT8 (QuantConfig(weight_only=True)): s8 weights, float
activations — no calibration needed, error bounded by weight rounding."""

import numpy as np
import pytest
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models


@pytest.mark.parametrize("name,shape", [
    ("lenet", (16, 1, 28, 28)),
    ("simple_conv", (8, 3, 32, 32)),
])
def test_weight_only_tracks_fp32(name, shape):
    """No prepare() required; outputs close to FP32 (weight rounding only)
    and much closer than full INT8."""
    tw = models.torch_twin(name)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, shape).astype(np.float32)
    want = tw(torch.tensor(x)).detach().numpy()

    m = models.build(name, config=QuantConfig(weight_only=True,
                                              weight_per_channel=True,
                                              rounding="nearest"))
    m.load(tw.state_dict())
    m.convert()                                   # no prepare: W8 only
    got = m(q.tensor(x)).numpy()
    assert np.isfinite(got).all()
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.05, rel
    assert (got.argmax(1) == want.argmax(1)).mean() >= 0.95

    # full INT8 for comparison: weight-only must be strictly closer to FP32
    m8 = models.build(name, config=QuantConfig())
    m8.load(tw.state_dict())
    m8.prepare()
    m8(q.tensor(x))
    m8.convert()
    full = m8(q.tensor(x)).numpy()
    assert (np.mean((got - want) ** 2)
            < np.mean((full - want) ** 2) + 1e-12)


def test_weight_only_decoder_generate():
    """The decode stack runs in W8 mode too: float activations, s8 weights,
    greedy generate() still works (logit codes path bypassed — the head
    returns float logits)."""
    m = models.build("gpt_tiny", config=QuantConfig(weight_only=True))
    m.load(models.torch_twin("gpt_tiny").state_dict())
    m.convert()
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 1000, (4, 16)).astype(np.int32)
    out = m(q.tensor(ids)).numpy()
    assert np.isfinite(out).all() and out.shape == (4, 16, 1000)

    tw = models.torch_twin("gpt_tiny")
    want = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    agree = (out[:, -1].argmax(-1) == want[:, -1].argmax(-1)).mean()
    assert agree >= 0.95, agree


def test_weight_only_params_are_int8():
    m = models.build("lenet", config=QuantConfig(weight_only=True))
    m.load(models.torch_twin("lenet").state_dict())
    m.convert()
    import jax.numpy as jnp
    layers = dict(m.named_layers())
    assert layers["conv1"].params["q_w_hwio"].dtype == jnp.int8
    assert layers["fc1"].params["q_weight"].dtype == jnp.int8
    assert layers["fc1"].params["bias"].dtype == jnp.float32


def test_weight_only_cached_decode_bit_identical():
    """W8-float generate(): the float KV cache path equals full-forward
    recompute token for token (masked columns contribute exact zeros),
    and the GenerationEngine agrees too."""
    m = models.build("gpt_tiny", config=QuantConfig(weight_only=True))
    m.load(models.torch_twin("gpt_tiny").state_dict())
    m.convert()
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 1000, (2, 9)).astype(np.int32)
    got = m.generate(prompt, 7)

    seq = prompt.copy()
    for s in range(7):
        logits = m(q.tensor(seq)).numpy()
        nxt = logits[:, -1].argmax(-1).astype(np.int32)
        np.testing.assert_array_equal(got[:, s], nxt, f"step {s}")
        seq = np.concatenate([seq, nxt[:, None]], axis=1)

    from int8inferenceengine_tpu.serve import GenerationEngine
    eng = GenerationEngine(m, slots=2, chunk_steps=3)
    try:
        fut = eng.submit(prompt[0], 7)
        np.testing.assert_array_equal(fut.result(timeout=300), got[0])
    finally:
        eng.shutdown()


def test_dynamic_act_quantization():
    """weight_only + dynamic_act: s8 x s8 MXU GEMMs with live per-batch
    activation scales — no calibration, tracks FP32 within quant error,
    and generate() still works."""
    for name, shape in (("lenet", (16, 1, 28, 28)),
                        ("simple_conv", (8, 3, 32, 32))):
        tw = models.torch_twin(name)
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, shape).astype(np.float32)
        want = tw(torch.tensor(x)).detach().numpy()
        m = models.build(name, config=QuantConfig(
            weight_only=True, dynamic_act=True, weight_per_channel=True,
            rounding="nearest"))
        m.load(tw.state_dict())
        m.convert()
        got = m(q.tensor(x)).numpy()
        assert np.isfinite(got).all()
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.1, (name, rel)
        assert (got.argmax(1) == want.argmax(1)).mean() >= 0.9, name

    m = models.build("gpt_tiny", config=QuantConfig(weight_only=True,
                                                    dynamic_act=True))
    m.load(models.torch_twin("gpt_tiny").state_dict())
    m.convert()
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 1000, (2, 8)).astype(np.int32)
    toks = m.generate(prompt, 6)
    assert toks.shape == (2, 6)
    # cached decode still equals full-forward recompute
    logits = m(q.tensor(prompt)).numpy()
    np.testing.assert_array_equal(toks[:, 0], logits[:, -1].argmax(-1))


def test_dynamic_act_per_token_isolation():
    """Per-token dynamic scales: one hot row must not degrade the other
    rows' quantization (the per-tensor failure mode)."""
    import jax.numpy as jnp
    from int8inferenceengine_tpu.layers import Linear
    rng = np.random.default_rng(7)
    w = rng.normal(0, 0.1, (32, 64)).astype(np.float32)
    lin = Linear(64, 32, config=QuantConfig(weight_only=True,
                                            dynamic_act=True))
    lin.load_weight(w)
    lin.load_bias(np.zeros(32, np.float32))
    lin.convert()
    x = rng.normal(0, 1, (16, 64)).astype(np.float32)
    ref = x @ w.T
    cold = lin(q.tensor(x)).numpy()
    x_hot = x.copy()
    x_hot[0] *= 1000.0                       # one extreme row
    hot = lin(q.tensor(x_hot)).numpy()
    # rows 1..15 are bit-identical with and without the hot neighbor
    np.testing.assert_array_equal(cold[1:], hot[1:])
    assert np.abs(cold - ref).max() < 0.15
