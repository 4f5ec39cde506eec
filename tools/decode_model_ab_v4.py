"""In-model A/B of the merged-dot decode kernel: full gpt2-small-ish and
llama decode steps, walk vs merged, same process / same chip hour.

Usage: python tools/decode_model_ab_v4.py [gpt2|llama] [walk|merged]
(one setting per process: the kernel choice is baked into the traced
generate program, so flipping _MERGED_DEFAULT mid-process would not
retrace).
"""
import os as _os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from int8inferenceengine_tpu import models, tensor
from int8inferenceengine_tpu.config import QuantConfig
from int8inferenceengine_tpu.ops import attention as A
from __graft_entry__ import _load_random_weights

B = 8


def build(family):
    if family == "gpt2":
        dec = models.build("gpt_tiny", vocab_size=50257, max_len=512,
                           dim=768, depth=12, heads=12,
                           config=QuantConfig())
        vocab = 50257
    else:
        dec = models.build("llama_tiny", vocab_size=32000, max_len=512,
                           dim=768, depth=12, heads=12, kv_heads=2,
                           config=QuantConfig(rounding="nearest"))
        vocab = 32000
    _load_random_weights(dec)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, vocab, (B, 64)).astype(np.int32)
    dec.prepare()
    dec(tensor(ids))
    dec.convert()
    return dec, ids, vocab


def step_time(dec, ids, vocab):
    dtimes = {}
    for steps in (32, 384):
        dec.generate(ids, steps)
        best = float("inf")
        for trial in range(4):
            p2 = (ids + trial + 1) % vocab
            t1 = time.perf_counter()
            dec.generate(p2, steps)
            best = min(best, time.perf_counter() - t1)
        dtimes[steps] = best
    return (dtimes[384] - dtimes[32]) / (384 - 32)


if __name__ == "__main__":
    fam = sys.argv[1] if len(sys.argv) > 1 else "gpt2"
    which = sys.argv[2] if len(sys.argv) > 2 else "merged"
    A._MERGED_DEFAULT = which == "merged"
    print("backend:", jax.default_backend(), flush=True)
    dec, ids, vocab = build(fam)
    for trial in range(2):
        per = step_time(dec, ids, vocab)
        print(f"{fam} {which}: {per*1e3:.3f} ms/step -> "
              f"{B/per:.0f} tok/s", flush=True)
