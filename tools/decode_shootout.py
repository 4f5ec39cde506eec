"""Decode-mode shootout on the real TPU chip (CLAUDE.md TPU TODO #2/#6/#8).

Usage: python /tmp/decode_shootout.py <mode>
Modes: static, static_qkv_pallas, static_qkv_auto, wo8, dyn, w4, w4_pallas

Measures gpt2-small-ish (768d/12L/12h, vocab 50257, max_len 512) decode
ms/step at batch 8 via the two-scan-length delta method (16 vs 128 steps).
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
from int8inferenceengine_tpu.config import QuantConfig
from __graft_entry__ import _load_random_weights

MODES = {
    "static": QuantConfig(),
    "static_qkv_pallas": QuantConfig(fuse_qkv="pallas"),
    "static_qkv_auto": QuantConfig(fuse_qkv="auto"),
    "wo8": QuantConfig(weight_only=True),
    "dyn": QuantConfig(weight_only=True, dynamic_act=True),
    "w4": QuantConfig(weight_only=True, weight_bits=4),
    "w4_pallas": QuantConfig(weight_only=True, weight_bits=4,
                             w4_kernel="pallas"),
}


def main():
    mode = sys.argv[1]
    cfg = MODES[mode]
    db = 8
    print(f"=== mode {mode} ===", flush=True)
    dec = models.build("gpt_tiny", vocab_size=50257, max_len=512,
                       dim=768, depth=12, heads=12, config=cfg)
    _load_random_weights(dec)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 50257, size=(db, 64)).astype(np.int32)
    if not cfg.weight_only:
        dec.prepare()
        dec(tensor(ids))
    t0 = time.perf_counter()
    dec.convert()
    print(f"convert: {time.perf_counter()-t0:.1f}s", flush=True)

    dtimes = {}
    for steps in (16, 128):
        t0 = time.perf_counter()
        dec.generate(ids, steps)  # compile
        print(f"steps={steps} compile+run: {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = float("inf")
        for trial in range(3):
            p2 = (ids + trial + 1) % 50257
            t1 = time.perf_counter()
            dec.generate(p2, steps)
            best = min(best, time.perf_counter() - t1)
        dtimes[steps] = best
    per_step = (dtimes[128] - dtimes[16]) / (128 - 16)
    print(f"RESULT {mode}: {per_step*1e3:.3f} ms/step -> "
          f"{db/per_step:.0f} tokens/s", flush=True)


if __name__ == "__main__":
    main()
