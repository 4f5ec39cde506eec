"""INT8 autoregressive decoding end-to-end: PTQ a causal LM, then generate.

Mirrors the reference notebooks' cell pattern (build twin -> load -> FP32
parity -> calibrate -> convert) and then exercises the decode stack:
``generate()`` (greedy + sampled) and the continuous-batching
``GenerationEngine``.  Runs on CPU in ~1 min (or on TPU as-is).

    python examples/text_generation.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models
from int8inferenceengine_tpu.serve import GenerationEngine


def main():
    torch.set_num_threads(1)
    tw = models.torch_twin("gpt_tiny")
    m = models.build("gpt_tiny")
    m.load(tw.state_dict())
    rng = np.random.default_rng(0)

    ids = rng.integers(0, 1000, (4, 32)).astype(np.int32)
    ref = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    out = m(q.tensor(ids)).numpy()
    print(f"FP32 parity: max |diff| = {np.abs(out - ref).max():.2e}")

    m.prepare()
    m(q.tensor(rng.integers(0, 1000, (16, 64)).astype(np.int32)))
    m.convert()
    out8 = m(q.tensor(ids)).numpy()
    agree = (out8[:, -1].argmax(-1) == ref[:, -1].argmax(-1)).mean()
    print(f"INT8 next-token argmax agreement vs torch FP32: {agree:.2f}")

    prompt = rng.integers(0, 1000, (2, 12)).astype(np.int32)
    greedy = m.generate(prompt, 16)
    print("greedy tokens   :", greedy[0].tolist())
    sampled = m.generate(prompt, 16, temperature=0.9, top_k=40, seed=1)
    print("sampled (t=0.9) :", sampled[0].tolist())

    eng = GenerationEngine(m, slots=2, chunk_steps=4)
    try:
        futs = [eng.submit(rng.integers(0, 1000, n).astype(np.int32), 8)
                for n in (5, 11, 19)]
        # per-request sampling rides the same slots as greedy requests
        futs.append(eng.submit(rng.integers(0, 1000, 7).astype(np.int32),
                               8, temperature=0.9, seed=2))
        for k, f in enumerate(futs):
            print(f"engine request {k}: {f.result(timeout=300).tolist()}")
    finally:
        eng.shutdown()
    print("OK")


if __name__ == "__main__":
    main()
