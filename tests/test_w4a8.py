"""W4A8: 4-bit grouped weights on the STATIC u8 activation path
(round-4 VERDICT #4; ops/w4.w4a8_matmul + layers.Linear).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models
from int8inferenceengine_tpu.config import QuantConfig
from int8inferenceengine_tpu.ops import w4 as W


def _op_case(seed, rounding):
    rng = np.random.default_rng(seed)
    n, k, m, g = 256, 256, 8, 128
    w = rng.normal(scale=0.1, size=(n, k)).astype(np.float32)
    packed, scales = W.pack_w4(jnp.asarray(w), g)
    x = rng.integers(0, 256, (m, k)).astype(np.uint8)
    bias = rng.normal(scale=0.1, size=(n,)).astype(np.float32)
    s_out, zp_out, s_x, zp_x = 0.07, 131, 0.05, 117
    zpb = jnp.float32(zp_out) + jnp.asarray(bias) / jnp.float32(s_out)
    kw = dict(zp_x=zp_x, mult=jnp.float32(s_x / s_out), rounding=rounding)
    xla = W.w4a8_matmul_xla(jnp.asarray(x), packed, scales, zpb, k, g,
                            **kw)
    pal = W.w4a8_matmul_pallas(jnp.asarray(x), packed, scales, zpb, k, g,
                               interpret=True, **kw)
    # f64 oracle
    wd = np.asarray(W.dequant_w4(packed, scales, k, g), np.float64)
    acc = (x.astype(np.float64) - zp_x) @ wd.T
    rb = 0.5 if rounding == "nearest" else 0.0
    ref = np.floor(np.clip(acc * (s_x / s_out) + zp_out + bias / s_out,
                           0, 255) + rb).astype(np.int64)
    return np.asarray(xla, np.int64), np.asarray(pal, np.int64), ref


@pytest.mark.parametrize("rounding", ["trunc", "nearest"])
def test_w4a8_op_matches_oracle(rounding):
    xla, pal, ref = _op_case(0, rounding)
    # float-epilogue tie caveat: f32 vs f64 rounding boundaries can
    # differ by one code on rare exact ties
    assert np.abs(xla - ref).max() <= 1 and \
        (xla != ref).mean() <= 0.002, (np.abs(xla - ref).max())
    assert np.abs(pal - xla).max() <= 1 and \
        (pal != xla).mean() <= 0.002


def test_w4a8_linear_layer():
    """Layer level: a converted W4A8 Linear consumes u8 codes and emits
    u8 codes matching the op-level oracle built from its own params."""
    rng = np.random.default_rng(2)
    lin = q.layers.Linear(128, 64, config=QuantConfig(weight_bits=4))
    wt = rng.normal(scale=0.1, size=(64, 128)).astype(np.float32)
    bias = rng.normal(scale=0.1, size=(64,)).astype(np.float32)
    lin.load_weight(wt)
    lin.load_bias(bias)
    lin.prepare()
    xf = rng.normal(scale=0.8, size=(16, 128)).astype(np.float32)
    lin(q.tensor(xf))
    lin.convert()
    s_x, zp_x = 0.02, 120
    codes = np.clip(np.round(xf / s_x) + zp_x, 0, 255).astype(np.uint8)
    out = lin(q.Tensor(jnp.asarray(codes), s_x, zp_x))
    assert out.quantized and np.asarray(out.data).dtype == np.uint8
    zpb = (jnp.float32(lin.zero_point)
           + lin.params["bias"] / jnp.float32(lin.scale))
    want = W.w4a8_matmul_xla(
        jnp.asarray(codes), lin.params["w4_packed"],
        lin.params["w4_scales"], zpb, 128, lin.config.w4_group,
        zp_x=zp_x, mult=jnp.float32(s_x) / jnp.float32(lin.scale),
        rounding="trunc")
    assert (np.asarray(out.data) == np.asarray(want)).all()


def test_w4a8_dynamic_act_rejected():
    lin = q.layers.Linear(8, 8, config=QuantConfig(weight_bits=4,
                                                   dynamic_act=True))
    lin.prepare()
    lin(q.tensor(np.ones((2, 8), np.float32)))
    with pytest.raises(ValueError, match="dynamic_act"):
        lin.convert()


def _decoder(family="gpt_tiny", **kw):
    from __graft_entry__ import _load_random_weights
    geo = dict(vocab_size=128, max_len=64, dim=128, depth=2, heads=4)
    geo.update(kw)
    dec = models.build(family, **geo)
    _load_random_weights(dec)
    return dec


@pytest.mark.parametrize("family,extra", [
    ("gpt_tiny", {}), ("llama_tiny", {"kv_heads": 2})])
def test_w4a8_decode_cached_equals_recompute(family, extra):
    """The cached-decode == full-forward-recompute invariant must hold
    in W4A8 exactly as in W8A8 static (same u8 KV-cache machinery)."""
    cfg = QuantConfig(weight_bits=4, rounding="nearest")
    dec = _decoder(family, config=cfg, **extra)
    ids = np.random.default_rng(3).integers(0, 128, (2, 8)).astype(
        np.int32)
    dec.prepare()
    dec(q.tensor(ids))
    dec.convert()
    toks = np.asarray(dec.generate(ids, 6))
    assert toks.shape == (2, 6)
    # greedy chain consistency: re-running from the longer prompt must
    # reproduce the suffix (cached decode == full recompute)
    longer = np.concatenate([ids, toks[:, :3]], axis=1)
    toks2 = np.asarray(dec.generate(longer, 3))
    assert (toks2 == toks[:, 3:6]).all()


def test_w4a8_tracks_fp32_argmax():
    cfg = QuantConfig(weight_bits=4, rounding="nearest")
    dec = _decoder(config=cfg)
    ref = _decoder()                      # same seed -> same weights
    ids = np.random.default_rng(4).integers(0, 128, (4, 12)).astype(
        np.int32)
    dec.prepare()
    dec(q.tensor(ids))
    dec.convert()
    got = np.asarray(dec(q.tensor(ids)).data).astype(np.float32)
    want = np.asarray(ref(q.tensor(ids)).data)
    agree = (got[:, -1].argmax(-1) == want[:, -1].argmax(-1)).mean()
    assert agree >= 0.75, agree


def test_w4a8_checkpoint_roundtrip(tmp_path):
    from int8inferenceengine_tpu import utils
    cfg = QuantConfig(weight_bits=4, rounding="nearest")
    dec = _decoder(config=cfg)
    ids = np.random.default_rng(5).integers(0, 128, (2, 8)).astype(
        np.int32)
    dec.prepare()
    dec(q.tensor(ids))
    dec.convert()
    want = np.asarray(dec(q.tensor(ids)).data)
    path = str(tmp_path / "w4a8.safetensors")
    utils.save(dec, path)
    dec2 = _decoder(config=cfg)
    utils.load(dec2, path)
    got = np.asarray(dec2(q.tensor(ids)).data)
    assert (got == want).all()
    assert (np.asarray(dec2.generate(ids, 4))
            == np.asarray(dec.generate(ids, 4))).all()


def test_w4a8_with_gptq_and_adaround():
    """Pre-convert optimizers ride the shared weight_quant_spec policy
    for static W4A8 too: GPTQ's stale weight_only gate sent W4A8 layers
    down the s8 path and tripped its bound assertion (round-4 fix).
    Both optimizers must produce 4-bit codes the static convert
    consumes, end to end."""
    from int8inferenceengine_tpu import utils
    cfg = QuantConfig(weight_bits=4, rounding="nearest")
    ids = np.random.default_rng(7).integers(0, 128, (4, 12)).astype(
        np.int32)
    for opt in ("gptq", "adaround"):
        dec = _decoder(config=cfg)
        dec.prepare()
        dec(q.tensor(ids))
        if opt == "gptq":
            utils.gptq(dec, ids)
        else:
            utils.adaround(dec, ids, iters=30)
        dec.convert()
        out = np.asarray(dec(q.tensor(ids)).data).astype(np.float32)
        assert np.isfinite(out).all()
        assert "w4_packed" in dec.wq1.params
