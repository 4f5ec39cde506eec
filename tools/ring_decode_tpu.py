"""Ring-cache on-chip A/B (round 5): llama + sliding window 256 at
max_len 2048, decode from a long prompt so the window is saturated.

The ring is a MEMORY lever (512 vs 2048 rows/layer here, 4x; 16x at
max_len 8k) — decode compute was already capped at ~W by the span
ladder, so the expectation to verify is speed PARITY (compaction
amortizes to ~1 row-copy/step) plus bit-identical tokens.

Usage: python tools/ring_decode_tpu.py
"""
import os as _os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from int8inferenceengine_tpu import models, tensor
from int8inferenceengine_tpu.config import QuantConfig
from __graft_entry__ import _load_random_weights

B, T, W = 8, 2048, 256


def build(ring):
    dec = models.build("llama_tiny", vocab_size=32000, max_len=T,
                       dim=768, depth=12, heads=12, kv_heads=2,
                       sliding_window=W, ring_cache=ring,
                       config=QuantConfig(rounding="nearest"))
    _load_random_weights(dec)
    rng = np.random.default_rng(0)
    dec.prepare()
    dec(tensor(rng.integers(0, 32000, (B, 64)).astype(np.int32)))
    dec.convert()
    return dec


def main():
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 32000, (B, 1500)).astype(np.int32)
    out = {}
    for ring in (False, True):
        dec = build(ring)
        rows = dec._cache_rows(1)
        dtimes = {}
        for steps in (32, 384):
            t0 = time.perf_counter()
            toks = dec.generate(prompt, steps)
            print(f"ring={ring} steps={steps} compile+run: "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            best = float("inf")
            for trial in range(4):
                p2 = (prompt + trial + 1) % 32000
                t1 = time.perf_counter()
                dec.generate(p2, steps)
                best = min(best, time.perf_counter() - t1)
            dtimes[steps] = best
        per = (dtimes[384] - dtimes[32]) / (384 - 32)
        out[ring] = (per, toks)
        print(f"RESULT ring={ring}: {per*1e3:.3f} ms/step "
              f"({B/per:.0f} tok/s; {rows} cache rows/layer)", flush=True)
    same = bool((out[False][1] == out[True][1]).all())
    print(f"tokens bit-identical ring vs full: {same}", flush=True)


if __name__ == "__main__":
    main()
