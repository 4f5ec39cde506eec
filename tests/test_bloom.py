"""BloomDecoder (BLOOM family): ALiBi attention + embedding LayerNorm.

The distinguishing machinery under test: QuantSoftmax(alibi_heads=) —
a per-head linear score bias replacing ALL positional embeddings —
must keep the u8-KV-cache invariant (the bias is a static function of
absolute positions, so cached decode == full-forward recompute), and
the decode fast path must route the bias through the XLA lowering
(ops/attention.py: the Pallas kernel has no per-head bias tail).
"""
import numpy as np
import pytest
import torch

from int8inferenceengine_tpu import models, tensor
from int8inferenceengine_tpu.config import QuantConfig
from int8inferenceengine_tpu.layers import alibi_slopes
from int8inferenceengine_tpu.models.bloom import BloomDecoder, torch_bloom
from int8inferenceengine_tpu.serve import GenerationEngine
from int8inferenceengine_tpu.utils import hf


def _pair(config=None, **kw):
    tw = torch_bloom(**kw)
    m = BloomDecoder(config=config or QuantConfig(rounding="nearest"),
                     **kw)
    m.load(tw.state_dict())
    return tw, m


def test_alibi_slopes_ladder():
    s8 = alibi_slopes(8)
    assert len(s8) == 8
    np.testing.assert_allclose(s8, [2.0 ** (-(i + 1)) for i in range(8)])
    s4 = alibi_slopes(4)
    np.testing.assert_allclose(s4, [2.0 ** (-2 * (i + 1))
                                    for i in range(4)])
    s6 = alibi_slopes(6)            # non-power-of-two interpolation
    # the standard recipe: the closest-power ladder plus the doubled
    # ladder's odd steps (NOT globally sorted — head order is the
    # checkpoint's head order)
    assert len(s6) == 6 and len(set(s6)) == 6
    np.testing.assert_allclose(s6[:4], alibi_slopes(4))
    np.testing.assert_allclose(s6[4:], [2.0 ** -1, 2.0 ** -3])


def test_fp32_parity():
    tw, m = _pair()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, (2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = tw(torch.tensor(ids.astype(np.int64))).numpy()
    out = np.asarray(m(tensor(ids)).data).reshape(2, 16, -1)
    assert abs(out - ref).max() < 5e-5


def test_alibi_actually_positions():
    """Permuting a prompt must change the logits (no positional signal
    would make attention permutation-invariant up to value mixing —
    the guard that the bias is alive)."""
    tw = torch_bloom()
    ids = torch.randint(0, 1000, (1, 12))
    perm = ids[:, torch.randperm(12)]
    with torch.no_grad():
        a, b = tw(ids), tw(perm)
    assert float((a[:, -1] - b[:, -1]).abs().max()) > 1e-3


def test_cached_decode_equals_recompute():
    """The ALiBi bias is a static function of ABSOLUTE positions, so the
    u8-cache invariant must hold bit-for-bit across decode steps."""
    _, m = _pair()
    rng = np.random.default_rng(2)
    m.prepare()
    m(tensor(rng.integers(0, 1000, (2, 16)).astype(np.int32)))
    m.convert()
    ids = rng.integers(0, 1000, (2, 6)).astype(np.int32)
    out = m.generate(ids, 8)
    seq = ids.copy()
    for _ in range(8):
        codes = np.asarray(m(tensor(seq)).data)
        codes = codes.reshape(seq.shape[0], seq.shape[1], -1)
        nxt = codes[:, -1].argmax(-1).astype(np.int32)
        seq = np.concatenate([seq, nxt[:, None]], axis=1)
    assert (out == seq[:, 6:]).all()


def test_engine_spec_and_sampling():
    _, m = _pair()
    rng = np.random.default_rng(3)
    m.prepare()
    m(tensor(rng.integers(0, 1000, (2, 16)).astype(np.int32)))
    m.convert()
    eng = GenerationEngine(m, slots=2, chunk_steps=4)
    try:
        out = eng.submit([3, 5, 7], 10).result()
        g = m.generate(np.asarray([[3, 5, 7]], np.int32), 10)[0]
        assert (out == g).all()
        s = eng.submit([3, 5, 7], 10, temperature=1.0, seed=1,
                       top_k=20, top_p=0.9).result()
        assert s.shape == (10,)
    finally:
        eng.shutdown()
    # speculative decoding over the alibi extend path (multi-row alibi
    # through fused_extend_attention's XLA route)
    spec = m.generate_speculative(m, np.asarray([[3, 5, 7]], np.int32),
                                  10, k=3)
    assert (spec == g[None]).all()


def test_tp_no_head_local():
    """ALiBi slopes index GLOBAL heads, so the family disables
    head-local TP (qkv replicated, MLP sharded) — sharded forward and
    generate must stay bit-exact."""
    import jax
    from int8inferenceengine_tpu.parallel import make_mesh
    _, m = _pair()
    rng = np.random.default_rng(4)
    m.prepare()
    m(tensor(rng.integers(0, 1000, (2, 16)).astype(np.int32)))
    m.convert()
    ids = rng.integers(0, 1000, (2, 10)).astype(np.int32)
    want = np.asarray(m(tensor(ids)).data)
    want_gen = m.generate(ids[:, :5], 4)
    m.shard(make_mesh((2, 2), devices=jax.devices()[:4]))
    assert not m.wq1._tp_local          # no head-local attention
    assert m.fc2_1._tp_row
    got = np.asarray(m(tensor(ids)).data)
    assert np.array_equal(got, want)
    assert np.array_equal(m.generate(ids[:, :5], 4), want_gen)


def test_hf_bloom_naming_loads():
    """A transformer.* bloom-named dict (fused per-head-interleaved
    self_attention.query_key_value) loads bit-identically to the direct
    twin load; from_hf_config maps model_type 'bloom' (no max length —
    ALiBi; the caller supplies max_len)."""
    tw, m = _pair()
    sd = {k: v.clone() for k, v in tw.state_dict().items()}
    sd["head.bias"] = torch.zeros_like(sd["head.bias"])
    m.load(sd)
    depth, dim, heads = 2, 128, 4
    hd = dim // heads
    d = {"transformer.word_embeddings.weight": sd["embed.weight"],
         "transformer.word_embeddings_layernorm.weight":
             sd["embed_ln.weight"],
         "transformer.word_embeddings_layernorm.bias":
             sd["embed_ln.bias"],
         "transformer.ln_f.weight": sd["ln_f.weight"],
         "transformer.ln_f.bias": sd["ln_f.bias"],
         "lm_head.weight": sd["head.weight"]}
    for n in range(depth):
        i = n + 1
        p = f"transformer.h.{n}."
        for src, dst in (("ln1_", "input_layernorm"),
                         ("ln2_", "post_attention_layernorm")):
            d[p + dst + ".weight"] = sd[f"{src}{i}.weight"]
            d[p + dst + ".bias"] = sd[f"{src}{i}.bias"]
        qw = sd[f"wq{i}.weight"].numpy().reshape(heads, hd, dim)
        kw = sd[f"wk{i}.weight"].numpy().reshape(heads, hd, dim)
        vw = sd[f"wv{i}.weight"].numpy().reshape(heads, hd, dim)
        d[p + "self_attention.query_key_value.weight"] = np.stack(
            [qw, kw, vw], axis=1).reshape(3 * dim, dim)
        qb = sd[f"wq{i}.bias"].numpy().reshape(heads, hd)
        kb = sd[f"wk{i}.bias"].numpy().reshape(heads, hd)
        vb = sd[f"wv{i}.bias"].numpy().reshape(heads, hd)
        d[p + "self_attention.query_key_value.bias"] = np.stack(
            [qb, kb, vb], axis=1).reshape(3 * dim)
        d[p + "self_attention.dense.weight"] = sd[f"proj{i}.weight"]
        d[p + "self_attention.dense.bias"] = sd[f"proj{i}.bias"]
        d[p + "mlp.dense_h_to_4h.weight"] = sd[f"fc1_{i}.weight"]
        d[p + "mlp.dense_h_to_4h.bias"] = sd[f"fc1_{i}.bias"]
        d[p + "mlp.dense_4h_to_h.weight"] = sd[f"fc2_{i}.weight"]
        d[p + "mlp.dense_4h_to_h.bias"] = sd[f"fc2_{i}.bias"]
    assert hf.detect(d.keys()) == "bloom"
    m2 = BloomDecoder(config=QuantConfig(rounding="nearest"))
    m2.load(d)
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 1000, (2, 10)).astype(np.int32)
    a = np.asarray(m(tensor(ids)).data)
    b = np.asarray(m2(tensor(ids)).data)
    assert (a == b).all()
    cls, kw2 = hf.from_hf_config(
        {"model_type": "bloom", "vocab_size": 1000, "hidden_size": 128,
         "n_layer": 2, "n_head": 4, "layer_norm_epsilon": 1e-5})
    assert cls is BloomDecoder and kw2["dim"] == 128 \
        and "max_len" not in kw2


def test_zoo_registry():
    m = models.build("bloom_tiny", config=QuantConfig(rounding="nearest"))
    tw = models.torch_twin("bloom_tiny")
    m.load(tw.state_dict())
    rng = np.random.default_rng(6)
    ids = rng.integers(0, 1000, (1, 8)).astype(np.int32)
    with torch.no_grad():
        ref = tw(torch.tensor(ids.astype(np.int64))).numpy()
    out = np.asarray(m(tensor(ids)).data).reshape(1, 8, -1)
    assert abs(out - ref).max() < 5e-5


def test_alibi_pallas_backend_refused():
    from int8inferenceengine_tpu.ops.attention import decode_attention_flat
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.integers(0, 256, (2, 128)), jnp.uint8)
    k = jnp.asarray(rng.integers(0, 256, (2, 32, 128)), jnp.uint8)
    kw = dict(scale_q=0.02, zp_q=120, scale_k=0.03, zp_k=130,
              scale_v=0.025, zp_v=125, scale_s=0.5, zp_s=100,
              scale_p=1 / 255, zp_p=0, scale_c=0.02, zp_c=128,
              alpha=0.125, rounding="trunc")
    with pytest.raises(ValueError):
        decode_attention_flat(q, k, k, 5, n_heads=4, backend="pallas",
                              alibi=alibi_slopes(4), **kw)
    with pytest.raises(ValueError):    # slope count must match heads
        decode_attention_flat(q, k, k, 5, n_heads=4, backend="xla",
                              alibi=alibi_slopes(8), **kw)
