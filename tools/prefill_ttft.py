"""Long-context prefill TTFT (round-4 VERDICT #3).

Measures time-to-first-token (wall clock, includes this host's ~20 ms
tunnel RTT) at prompt lengths 64..2048, b8, max_len=2048, for the gpt2
and llama geometries.  The composed prefill path materializes u8
[B, H, T, T] score AND probability tensors per layer — at T=2048 that
is ~400 MB per tensor per layer of HBM traffic, so this is where a
quadratic cliff would live.

Usage: python tools/prefill_ttft.py [gpt2|llama] [T ...]
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

B, MAXLEN = 8, 2048


def build(family):
    if family == "gpt2":
        dec = models.build("gpt_tiny", vocab_size=50257, max_len=MAXLEN,
                           dim=768, depth=12, heads=12,
                           config=QuantConfig())
        vocab = 50257
    else:
        dec = models.build("llama_tiny", vocab_size=32000, max_len=MAXLEN,
                           dim=768, depth=12, heads=12, kv_heads=2,
                           config=QuantConfig(rounding="nearest"))
        vocab = 32000
    _load_random_weights(dec)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, vocab, (B, 64)).astype(np.int32)
    dec.prepare()
    dec(tensor(ids))
    t0 = time.perf_counter()
    dec.convert()
    print(f"convert: {time.perf_counter()-t0:.1f}s", flush=True)
    return dec, vocab


def ttft(dec, vocab, t_prompt):
    rng = np.random.default_rng(1)
    ids = rng.integers(0, vocab, (B, t_prompt)).astype(np.int32)
    t0 = time.perf_counter()
    dec.generate(ids, 1)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for trial in range(4):
        p = (ids + trial + 1) % vocab
        t1 = time.perf_counter()
        dec.generate(p, 1)
        best = min(best, time.perf_counter() - t1)
    return best, compile_s


if __name__ == "__main__":
    fam = sys.argv[1] if len(sys.argv) > 1 else "gpt2"
    lens = [int(x) for x in sys.argv[2:]] or [64, 256, 512, 1024, 2048]
    print("backend:", jax.default_backend(), flush=True)
    dec, vocab = build(fam)
    print(f"{fam}: TTFT (b8, max_len={MAXLEN}, wall incl ~20ms RTT)")
    for t in lens:
        if t >= MAXLEN:
            t = MAXLEN - 2
        best, comp = ttft(dec, vocab, t)
        print(f"  T={t:5d}: {best*1e3:8.1f} ms  "
              f"({B*t/best/1e3:.0f}k prefill tok/s; compile {comp:.0f}s)",
              flush=True)
