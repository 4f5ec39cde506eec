"""NeoXDecoder (GPT-NeoX / Pythia family): parallel residual + partial
rotary + biased LayerNorm stack on the shared decode machinery."""
import numpy as np
import pytest
import torch

from int8inferenceengine_tpu import models, tensor
from int8inferenceengine_tpu.config import QuantConfig
from int8inferenceengine_tpu.models.neox import NeoXDecoder, torch_neox
from int8inferenceengine_tpu.serve import GenerationEngine


def _pair(parallel=True, rotary_pct=0.25, config=None):
    tw = torch_neox(use_parallel_residual=parallel, rotary_pct=rotary_pct)
    m = NeoXDecoder(use_parallel_residual=parallel, rotary_pct=rotary_pct,
                    config=config or QuantConfig(rounding="nearest"))
    m.load(tw.state_dict())
    return tw, m


@pytest.mark.parametrize("parallel", [True, False])
def test_fp32_parity(parallel):
    tw, m = _pair(parallel)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, (2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = tw(torch.tensor(ids.astype(np.int64))).numpy()
    out = np.asarray(m(tensor(ids)).data).reshape(2, 16, -1)
    assert abs(out - ref).max() < 5e-5


def test_nondefault_eps_parity():
    """eps must reach every QuantLayerNorm (round-4 advisor finding:
    it was accepted but dropped, silently mismatching any checkpoint
    trained with a non-default eps).  A large eps makes the mismatch
    unmissable if the passthrough regresses."""
    eps = 1e-1
    tw = torch_neox(eps=eps)
    m = NeoXDecoder(eps=eps, config=QuantConfig(rounding="nearest"))
    m.load(tw.state_dict())
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 1000, (2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = tw(torch.tensor(ids.astype(np.int64))).numpy()
    out = np.asarray(m(tensor(ids)).data).reshape(2, 12, -1)
    assert abs(out - ref).max() < 5e-5
    # and the default-eps model genuinely disagrees with the eps=0.1
    # twin (guards against a vacuous parity pass)
    m_def = NeoXDecoder(config=QuantConfig(rounding="nearest"))
    m_def.load(tw.state_dict())
    out_def = np.asarray(m_def(tensor(ids)).data).reshape(2, 12, -1)
    assert abs(out_def - ref).max() > 1e-3


def test_parallel_vs_sequential_differ():
    """Guard that the flag actually changes the topology (identical
    outputs would mean the hook is dead code)."""
    t1 = torch_neox(use_parallel_residual=True)
    t2 = torch_neox(use_parallel_residual=False)
    ids = torch.randint(0, 1000, (2, 16))
    with torch.no_grad():
        assert float((t1(ids) - t2(ids)).abs().max()) > 1e-3


@pytest.mark.parametrize("rotary_pct", [0.25, 0.5, 1.0])
def test_partial_rotary_parity(rotary_pct):
    tw, m = _pair(rotary_pct=rotary_pct)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 1000, (2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = tw(torch.tensor(ids.astype(np.int64))).numpy()
    out = np.asarray(m(tensor(ids)).data).reshape(2, 12, -1)
    assert abs(out - ref).max() < 5e-5


def test_cached_decode_equals_recompute():
    """The u8-KV-cache invariant on the neox block: greedy generate()
    (cached steps) emits exactly the tokens a full-forward recompute
    argmax chain would."""
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


def test_hf_neox_naming_loads():
    """A gpt_neox.* named dict (fused per-head-interleaved
    query_key_value) loads bit-identically to the direct twin load."""
    tw, m = _pair()
    sd = {k: v.clone() for k, v in tw.state_dict().items()}
    # HF neox's embed_out carries no bias; zero it on the direct-load
    # side so the comparison is apples-to-apples
    sd["head.bias"] = torch.zeros_like(sd["head.bias"])
    m.load(sd)
    depth, dim, heads = 2, 128, 4
    hd = dim // heads
    hf = {"gpt_neox.embed_in.weight": sd["embed.weight"],
          "gpt_neox.final_layer_norm.weight": sd["ln_f.weight"],
          "gpt_neox.final_layer_norm.bias": sd["ln_f.bias"],
          "embed_out.weight": sd["head.weight"]}
    for n in range(depth):
        i = n + 1
        p = f"gpt_neox.layers.{n}."
        hf[p + "input_layernorm.weight"] = sd[f"ln1_{i}.weight"]
        hf[p + "input_layernorm.bias"] = sd[f"ln1_{i}.bias"]
        hf[p + "post_attention_layernorm.weight"] = sd[f"ln2_{i}.weight"]
        hf[p + "post_attention_layernorm.bias"] = sd[f"ln2_{i}.bias"]
        # fuse q/k/v back into the HF per-head-interleaved layout
        qw = sd[f"wq{i}.weight"].numpy().reshape(heads, hd, dim)
        kw = sd[f"wk{i}.weight"].numpy().reshape(heads, hd, dim)
        vw = sd[f"wv{i}.weight"].numpy().reshape(heads, hd, dim)
        hf[p + "attention.query_key_value.weight"] = np.stack(
            [qw, kw, vw], axis=1).reshape(3 * dim, dim)
        qb = sd[f"wq{i}.bias"].numpy().reshape(heads, hd)
        kb = sd[f"wk{i}.bias"].numpy().reshape(heads, hd)
        vb = sd[f"wv{i}.bias"].numpy().reshape(heads, hd)
        hf[p + "attention.query_key_value.bias"] = np.stack(
            [qb, kb, vb], axis=1).reshape(3 * dim)
        hf[p + "attention.dense.weight"] = sd[f"proj{i}.weight"]
        hf[p + "attention.dense.bias"] = sd[f"proj{i}.bias"]
        hf[p + "mlp.dense_h_to_4h.weight"] = sd[f"fc1_{i}.weight"]
        hf[p + "mlp.dense_h_to_4h.bias"] = sd[f"fc1_{i}.bias"]
        hf[p + "mlp.dense_4h_to_h.weight"] = sd[f"fc2_{i}.weight"]
        hf[p + "mlp.dense_4h_to_h.bias"] = sd[f"fc2_{i}.bias"]
        # derived buffers HF exports ship; must be dropped silently
        hf[p + "attention.rotary_emb.inv_freq"] = np.zeros(hd // 8)
    m2 = NeoXDecoder(config=QuantConfig(rounding="nearest"))
    m2.load(hf)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 1000, (2, 10)).astype(np.int32)
    a = np.asarray(m(tensor(ids)).data)
    b = np.asarray(m2(tensor(ids)).data)
    assert (a == b).all()


def test_engine_and_sampling():
    _, m = _pair()
    rng = np.random.default_rng(4)
    m.prepare()
    m(tensor(rng.integers(0, 1000, (2, 16)).astype(np.int32)))
    m.convert()
    eng = GenerationEngine(m, slots=2, chunk_steps=4)
    try:
        out = eng.submit([3, 5, 7], 10).result()
        g = m.generate(np.asarray([[3, 5, 7]], np.int32), 10)[0]
        assert (out == g).all()
        s = eng.submit([3, 5, 7], 10, temperature=1.0, seed=1,
                       top_p=0.8).result()
        assert s.shape == (10,)
    finally:
        eng.shutdown()


def test_zoo_registry():
    m = models.build("neox_tiny", config=QuantConfig())
    tw = models.torch_twin("neox_tiny")
    m.load(tw.state_dict())
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 1000, (1, 8)).astype(np.int32)
    with torch.no_grad():
        ref = tw(torch.tensor(ids.astype(np.int64))).numpy()
    out = np.asarray(m(tensor(ids)).data).reshape(1, 8, -1)
    assert abs(out - ref).max() < 5e-5
