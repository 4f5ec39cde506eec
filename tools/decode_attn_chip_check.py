"""On-chip bit-exactness: generate() through the Pallas decode-attention
kernel vs the composed path ('off'), plus per-slot engine equivalence."""
import sys
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import torch
from int8inferenceengine_tpu import models, tensor
from int8inferenceengine_tpu.config import QuantConfig
from int8inferenceengine_tpu.serve import GenerationEngine

torch.manual_seed(0)
rng = np.random.default_rng(0)
ids = rng.integers(0, 1000, (4, 16)).astype(np.int32)

outs = {}
for mode in ("off", "pallas"):
    torch.manual_seed(0)
    tw = models.torch_twin("gpt_tiny")
    m = models.build("gpt_tiny", config=QuantConfig(decode_attention=mode))
    m.load(tw.state_dict())
    m.prepare(); m(tensor(ids)); m.convert()
    outs[mode] = np.asarray(m.generate(ids, 12))
    if mode == "pallas":
        eng = GenerationEngine(m, slots=3, chunk_steps=4)
        try:
            futs = [eng.submit(ids[i], max_new_tokens=12) for i in range(4)]
            eng_out = [f.result(timeout=600) for f in futs]
        finally:
            eng.shutdown()
ok = np.array_equal(outs["off"], outs["pallas"])
print(f"generate pallas == composed on chip: {ok}", flush=True)
assert ok
ok2 = all(np.array_equal(eng_out[i], outs["off"][i]) for i in range(4))
print(f"engine (per-slot kernel path) == standalone: {ok2}", flush=True)
assert ok2
print("OK", flush=True)
