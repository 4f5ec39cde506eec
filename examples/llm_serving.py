"""Modern-LM serving tour: llama-family INT8 PTQ end to end.

The round-3 serving stack in one script — llama GQA decode, RMSNorm
smoothing, the accuracy configuration for many-boundary stacks
(rounding='nearest', see tests/test_llama.py), speculative decoding
(draft model, target-exact greedy), the MoE family with expert
parallelism, and a quantized-artifact checkpoint round-trip.  Runs on
CPU in ~2 min (or on TPU as-is).

    python examples/llm_serving.py
"""

import sys
import tempfile

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

    # --- continuous-batching engine -------------------------------------
    eng = GenerationEngine(m, slots=2, chunk_steps=8)
    try:
        futs = [eng.submit(prompt[i], 8) for i in range(4)]
        outs = [f.result(timeout=600) for f in futs]
        ok = all(np.array_equal(outs[i], m.generate(
            prompt[i:i + 1], 8)[0]) for i in range(4))
        print(f"engine == standalone generate per request: {ok}")
    finally:
        eng.shutdown()

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
