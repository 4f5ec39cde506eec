"""Speculative-decoding mechanism economics on chip (round 3).

Untrained random-weight models give a real draft chance-level acceptance
(argmax sequences of unrelated random nets), so end-to-end spec tok/s on
this toy would measure the DRAFT, not the mechanism.  What transfers to
real checkpoints is measured here instead:

1. **Verify amortization**: `_extend_step(m)` device time vs one
   `_decode_step` at the llama bench geometry — decode is
   weight-read-bound, so one m-row pass should cost ~one step, and that
   ratio is the engine of the speculative speedup: with a draft at
   fraction f of target cost and acceptance rate alpha,
   speedup ~ (1 + k*alpha) / (k*f + extend(k+1)/step).
2. **Full-loop sanity + overhead**: `generate_speculative` with
   draft == target (acceptance 1.0 by construction) must run on chip,
   match generate() bit-for-bit, and its wall tok/s vs plain generate()
   bounds the macro-step overhead.

Usage: python tools/spec_decode_tpu.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from int8inferenceengine_tpu import models, tensor
from int8inferenceengine_tpu.config import QuantConfig
from int8inferenceengine_tpu.tensor import Tensor
from __graft_entry__ import _load_random_weights

B, T = 8, 512
rng = np.random.default_rng(0)


def scan_time(m, body, carry0, k_short=64, k_long=256):
    """Chained-scan per-call device time of ``body`` (runs with the
    model's params bound as traced args, like generate() does)."""
    params = m._gather_params()

    def make(kk):
        @jax.jit
        def loop(params, c):
            m._bind(params)
            try:
                out, _ = lax.scan(lambda c, _: (body(c), None), c, None,
                                  length=kk)
            finally:
                m._bind(None)
            return jax.tree_util.tree_map(
                lambda a: jnp.sum(jnp.ravel(a)[:1].astype(jnp.float32)),
                out)
        return loop

    times = {}
    for kk in (k_short, k_long):
        loop = make(kk)
        jax.block_until_ready(loop(params, carry0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(params, carry0))
            best = min(best, time.perf_counter() - t0)
        times[kk] = best
    return (times[k_long] - times[k_short]) / (k_long - k_short)


def main():
    m = models.build("llama_tiny", vocab_size=32000, max_len=T, dim=768,
                     depth=12, heads=12, kv_heads=2,
                     config=QuantConfig(rounding="nearest"))
    _load_random_weights(m)
    ids = rng.integers(0, 32000, (B, 64)).astype(np.int32)
    m.prepare(); m(tensor(ids)); m.convert()
    print("target converted", flush=True)

    params = m._gather_params()

    @jax.jit
    def prefill(params, prompt):
        m._bind(params)
        try:
            return m._prefill(Tensor(prompt.astype(jnp.float32)))
        finally:
            m._bind(None)

    _, cache = prefill(params, jnp.asarray(ids))
    jax.block_until_ready(cache[1][0])
    print("prefilled", flush=True)

    # 1) one decode step vs extend(m), both at fixed pos (valid = 65)
    def step1(c):
        cache, pos, tok = c
        codes, cache = m._decode_step(cache, pos, tok)
        return (cache, pos, jnp.argmax(codes, -1).astype(jnp.int32))

    t1 = scan_time(m, step1, (cache, jnp.int32(64),
                              jnp.zeros((B,), jnp.int32)))
    print(f"decode step: {t1*1e3:.3f} ms", flush=True)

    for mrows in (2, 5, 9):
        def stepm(c, mrows=mrows):
            cache, pos, tok = c
            toks = jnp.broadcast_to(tok[:, None], (B, mrows))
            codes, cache = m._extend_step(cache, pos, toks)
            nxt = jnp.argmax(codes[:, -1], -1).astype(jnp.int32)
            return (cache, pos, nxt)

        tm = scan_time(m, stepm, (cache, jnp.int32(64),
                                  jnp.zeros((B,), jnp.int32)))
        print(f"extend m={mrows}: {tm*1e3:.3f} ms = {tm/t1:.2f}x one "
              f"step -> verify amortization {mrows/(tm/t1):.1f} "
              f"tokens/step-cost", flush=True)

    # 2) full loop, self-draft (acceptance 1.0)
    prompt = rng.integers(0, 32000, (B, 64)).astype(np.int32)
    steps = 96
    t0 = time.perf_counter()
    m.generate(prompt, steps)
    print(f"plain generate compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        m.generate((prompt + i + 1) % 32000, steps)
        best = min(best, time.perf_counter() - t0)
    print(f"plain generate: {B*steps/best:.0f} tok/s wall", flush=True)

    t0 = time.perf_counter()
    got = m.generate_speculative(m, prompt, steps, k=4)
    print(f"spec (self-draft) compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)
    want = m.generate(prompt, steps)
    print(f"spec == generate on chip: {np.array_equal(got, want)}",
          flush=True)
    best = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        m.generate_speculative(m, (prompt + i + 1) % 32000, steps, k=4)
        best = min(best, time.perf_counter() - t0)
    print(f"spec (self-draft, k=4): {B*steps/best:.0f} tok/s wall "
          f"(acceptance 1.0; draft cost == target cost, so this bounds "
          f"loop overhead, not the real speedup)", flush=True)


if __name__ == "__main__":
    main()
