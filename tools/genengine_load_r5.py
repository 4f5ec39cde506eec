"""Round-5 saturated-load serving sweep: the engine with ALL the
round-5 machinery (per-slot eos/topk/topp/stop args in the programs,
multi-chunk syncing) at three loads x two sync settings — the current
code's version of the round-2/4 load tables.

Protocol: gpt2-small-ish (768d/12L, vocab 50257, max_len 512), 8
slots, chunk 32, 24-token prompts; tok/s = delivered new tokens /
wall, best of 2 after a warm round.
"""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from int8inferenceengine_tpu import models, tensor
from int8inferenceengine_tpu.serve.generation import GenerationEngine
from __graft_entry__ import _load_random_weights

rng = np.random.default_rng(0)
dec = models.build("gpt_tiny", vocab_size=50257, max_len=512,
                   dim=768, depth=12, heads=12)
_load_random_weights(dec)
ids = rng.integers(0, 50257, (8, 64)).astype(np.int32)
dec.prepare(); dec(tensor(ids)); dec.convert()
print("converted", flush=True)

for sync in (1, 4, 8):
    eng = GenerationEngine(dec, slots=8, chunk_steps=32,
                           sync_chunks=sync)
    try:
        prompts = [rng.integers(0, 50257, (24,)).astype(np.int32)
                   for _ in range(16)]

        def round_once(max_new):
            t0 = time.perf_counter()
            futs = [eng.submit(p, max_new) for p in prompts]
            n = sum(len(f.result()) for f in futs)
            return n / (time.perf_counter() - t0)

        round_once(64)                 # warm/compile
        for max_new in (64, 256):
            best = max(round_once(max_new) for _ in range(2))
            print(f"  sync={sync} max_new={max_new}: "
                  f"{best:,.0f} tok/s", flush=True)
    finally:
        eng.shutdown()
