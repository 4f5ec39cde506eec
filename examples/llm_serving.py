"""Modern-LM serving tour: llama-family INT8 PTQ end to end.

The serving stack in one script — llama GQA decode, RMSNorm smoothing,
the accuracy configuration for many-boundary stacks
(rounding='nearest', see tests/test_llama.py), HF-named checkpoint
ingestion (utils/hf.py), speculative decoding (draft model,
target-exact greedy), the continuous-batching engine with multi-chunk
syncing, W4A8 serving (4-bit weights on the u8 activation path — the
fastest sub-W8 mode, README), the MoE family with expert parallelism
and sparse dispatch, and a quantized-artifact checkpoint round-trip.
Runs on CPU in ~2-3 min (or on TPU as-is).

    python examples/llm_serving.py
"""

import sys
import tempfile

import os

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # this host pre-imports jax with the remote axon TPU platform;
    # honoring the env var needs a post-import config update
    # (CLAUDE.md gotcha)
    jax.config.update("jax_platforms", "cpu")


sys.path.insert(0, ".")

import numpy as np
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models, utils
from int8inferenceengine_tpu.serve import GenerationEngine


def main():
    torch.set_num_threads(1)
    rng = np.random.default_rng(0)
    cal = rng.integers(0, 1000, (8, 64)).astype(np.int32)
    prompt = rng.integers(0, 1000, (4, 12)).astype(np.int32)

    # --- llama-family target: RMSNorm / RoPE / GQA / SwiGLU -------------
    cfg = QuantConfig(rounding="nearest")   # the many-boundary setting
    tw = models.torch_twin("llama_tiny")
    m = models.build("llama_tiny", config=cfg)
    m.load(tw.state_dict())
    ref = tw(torch.tensor(prompt, dtype=torch.long)).detach().numpy()
    print(f"llama FP32 parity: max |diff| = "
          f"{np.abs(m(q.tensor(prompt)).numpy() - ref).max():.2e}")

    # SmoothQuant-style RMSNorm smoothing, then calibrate + convert
    utils.smooth(m, utils.transformer_smooth_pairs(m), cal)
    m.prepare()
    m(q.tensor(cal))
    m.convert()
    out8 = m(q.tensor(prompt)).numpy()
    agree = (out8[:, -1].argmax(-1) == ref[:, -1].argmax(-1)).mean()
    print(f"llama INT8 next-token agreement vs torch FP32: {agree:.2f}")

    # greedy generate over the kv-compact u8 cache
    toks = m.generate(prompt, 10)
    print(f"generate: {toks.shape} tokens, row0 = {toks[0].tolist()}")

    # --- speculative decoding: small gpt draft, llama target ------------
    draft = models.build("gpt_tiny", dim=64, depth=1, heads=2)
    from int8inferenceengine_tpu.models.text_decoder import \
        torch_text_decoder
    draft.load(torch_text_decoder(dim=64, depth=1, heads=2).state_dict())
    draft.prepare()
    draft(q.tensor(cal))
    draft.convert()
    spec = m.generate_speculative(draft, prompt, 10, k=4)
    print(f"speculative == greedy generate: "
          f"{np.array_equal(spec, toks)}")

    # --- HF-named checkpoint ingestion ----------------------------------
    # real llama exports use model.layers.N.self_attn.q_proj.weight
    # naming; Module.load translates automatically (utils/hf.py)
    import re as _re
    hf_dict = {}
    for k, v in tw.state_dict().items():
        mm_ = _re.match(r"(wq|wk|wv|proj|gate|up|down|ln1_|ln2_)(\d+)"
                        r"\.weight", k)
        if mm_:
            tail = {"wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
                    "wv": "self_attn.v_proj", "proj": "self_attn.o_proj",
                    "gate": "mlp.gate_proj", "up": "mlp.up_proj",
                    "down": "mlp.down_proj", "ln1_": "input_layernorm",
                    "ln2_": "post_attention_layernorm"}[mm_.group(1)]
            hf_dict[f"model.layers.{int(mm_.group(2)) - 1}"
                    f".{tail}.weight"] = v
        else:
            hf_dict[{"embed.weight": "model.embed_tokens.weight",
                     "ln_f.weight": "model.norm.weight",
                     "head.weight": "lm_head.weight"}[k]] = v
    m_hf = models.build("llama_tiny", config=cfg)
    m_hf.load(hf_dict)
    ok_hf = all(
        np.array_equal(np.asarray(getattr(m_hf, nm).params["weight"]),
                       getattr(tw, nm).weight.detach().numpy())
        for nm in ("wq1", "gate1", "down1", "head"))
    print(f"HF-named state_dict loads bit-identically: {ok_hf}")

    # --- continuous-batching engine (multi-chunk syncing) ---------------
    eng = GenerationEngine(m, slots=2, chunk_steps=8, sync_chunks=4)
    try:
        futs = [eng.submit(prompt[i], 8) for i in range(4)]
        outs = [f.result(timeout=600) for f in futs]
        ok = all(np.array_equal(outs[i], m.generate(
            prompt[i:i + 1], 8)[0]) for i in range(4))
        print(f"engine (sync_chunks=4) == standalone generate: {ok}")
        # round 5: per-request sampling filters (dynamic code-threshold
        # top_k AND top_p in one compiled program), per-request eos,
        # and streaming token output
        streamed = list(eng.submit_stream(
            prompt[0], 8, temperature=0.9, seed=7, top_k=20, top_p=0.9))
        again = eng.submit(prompt[0], 8, temperature=0.9, seed=7,
                           top_k=20, top_p=0.9).result(timeout=600)
        print(f"streamed sampled tokens (top_k=20, top_p=0.9) == "
              f"resubmission: {np.array_equal(streamed, again)}")
    finally:
        eng.shutdown()

    # --- round 5: the engine drives a shard()ed decoder -----------------
    import jax as _jax
    if len(_jax.devices()) >= 4:
        from int8inferenceengine_tpu.parallel.mesh import make_mesh
        m_tp = models.build("llama_tiny", config=cfg)
        m_tp.load(tw.state_dict())
        m_tp.prepare()
        m_tp(q.tensor(cal))
        m_tp.convert()
        want_tp = m_tp.generate(prompt[:1], 8)[0]
        m_tp.shard(make_mesh((2, 2), devices=_jax.devices()[:4]))
        eng_tp = GenerationEngine(m_tp, slots=2, chunk_steps=8)
        try:
            got_tp = eng_tp.submit(prompt[0], 8).result(timeout=600)
        finally:
            eng_tp.shutdown()
        print(f"SHARDED engine (TP (2,2) mesh, head-sharded u8 cache) "
              f"== generate: {np.array_equal(got_tp, want_tp)}")
    else:
        print("(fewer than 4 devices: skipping the sharded-engine leg)")

    # --- W4A8: 4-bit weights on the static u8 activation path -----------
    w4 = models.build("llama_tiny",
                      config=QuantConfig(rounding="nearest",
                                         weight_bits=4, w4_group=256))
    w4.load(tw.state_dict())
    w4.prepare()
    w4(q.tensor(cal))
    w4.convert()
    w4_out = w4(q.tensor(prompt)).numpy()
    w4_agree = (w4_out[:, -1].argmax(-1) == ref[:, -1].argmax(-1)).mean()
    print(f"W4A8 (half the weight bytes, u8 serving glue) next-token "
          f"agreement: {w4_agree:.2f}")

    # --- quantized-artifact checkpoint ----------------------------------
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/llama_int8.npz"
        utils.save(m, path)
        fresh = models.build("llama_tiny", config=cfg)
        utils.load(fresh, path)
        print(f"checkpoint round-trip bit-exact: "
              f"{np.array_equal(fresh.generate(prompt, 10), toks)}")

    # --- MoE family + expert parallelism --------------------------------
    moe = models.build("moe_tiny", config=cfg)
    moe.load(models.torch_twin("moe_tiny").state_dict())
    moe.prepare()
    moe(q.tensor(cal))
    moe.convert()
    base = moe(q.tensor(prompt)).numpy()
    import jax
    if len(jax.devices()) >= 8:
        from int8inferenceengine_tpu.parallel.mesh import make_mesh
        moe.shard(make_mesh((4, 2)))   # DP x (TP attention + EP experts)
        ep_ok = np.array_equal(moe(q.tensor(prompt)).numpy(), base)
        print(f"expert-parallel forward bit-exact: {ep_ok}")
    else:
        print("(single device: skipping the expert-parallel leg)")


if __name__ == "__main__":
    main()
