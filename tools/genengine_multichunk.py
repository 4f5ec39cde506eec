"""Engine multi-chunk sync A/B on chip (round-4 VERDICT #8).

Same protocol as tools/genengine_load.py (gpt2-small-ish, 8 slots,
64 new tokens/request), sweeping sync_chunks x chunk_steps — plus a
LONG-generation leg (256 new tokens/request) where the sync count is
the dominant cost and the while_loop has room to run.

Usage: python tools/genengine_multichunk.py
"""
import sys
import time

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


def run(eng, n_req, max_new):
    # warm round (prefill (bucket, n) compiles are timing-dependent)
    futs = [eng.submit(rng.integers(0, 50257, int(rng.integers(8, 33))),
                       max_new) for _ in range(n_req)]
    [f.result() for f in futs]
    best = 0.0
    for _ in range(2):
        eng.stats.__init__()
        t0 = time.perf_counter()
        futs = [eng.submit(
            rng.integers(0, 50257, int(rng.integers(8, 33))),
            max_new) for _ in range(n_req)]
        outs = [f.result() for f in futs]
        dt = time.perf_counter() - t0
        toks = sum(len(o) for o in outs)
        best = max(best, toks / dt)
    return best, eng.stats.chunks


for chunk_steps in (16, 32):
    for sync in (1, 2, 4, 8):
        eng = GenerationEngine(dec, slots=8, chunk_steps=chunk_steps,
                               sync_chunks=sync)
        try:
            r64, ch64 = run(eng, 8, 64)
            r256, ch256 = run(eng, 8, 256)
            print(f"chunk={chunk_steps:2d} sync={sync}: "
                  f"64tok {r64:7.0f} tok/s ({ch64} ch)  "
                  f"256tok {r256:7.0f} tok/s ({ch256} ch)", flush=True)
        finally:
            eng.shutdown()
