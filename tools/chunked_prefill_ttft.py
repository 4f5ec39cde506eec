"""Round-5 chunked-prefill warm-TTFT sweep (engine prefill_chunk path).

Round 4 measured ONE point (2000-token prompt: cold 36.7 s = the single
extend compile, warm 118 ms).  This sweeps warm TTFT over prompt
lengths through the SAME one-compile program: a GenerationEngine with
``prefill_chunk=P`` prefills any prompt longer than P through the
fixed-shape ``_extend_step`` chunk program, so every length shares one
compile (vs a 3-5 minute per-(bucket, n) compile at T=2048 on the
bucket path — tools/prefill_ttft.py).

TTFT here = wall clock from ``submit(prompt, max_new_tokens=1)`` to
``fut.result()``, including this host's ~20 ms tunnel RTT per chunk
dispatch (the chunked path round-trips the host once per chunk — the
expected slope is ~(T/P) * RTT + device time).

Usage: python tools/chunked_prefill_ttft.py [P] [T ...]
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
from int8inferenceengine_tpu.serve import GenerationEngine
from __graft_entry__ import _load_random_weights

MAXLEN, VOCAB = 2048, 50257


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    lens = [int(x) for x in sys.argv[2:]] or [256, 512, 1024, 2000]
    print("backend:", jax.default_backend(), flush=True)
    dec = models.build("gpt_tiny", vocab_size=VOCAB, max_len=MAXLEN,
                       dim=768, depth=12, heads=12, config=QuantConfig())
    _load_random_weights(dec)
    rng = np.random.default_rng(0)
    dec.prepare()
    dec(tensor(rng.integers(0, VOCAB, (8, 64)).astype(np.int32)))
    t0 = time.perf_counter()
    dec.convert()
    print(f"convert: {time.perf_counter()-t0:.1f}s", flush=True)
    eng = GenerationEngine(dec, slots=2, prefill_chunk=P)
    try:
        print(f"chunked-prefill TTFT (P={P}, max_len={MAXLEN}, gpt2 "
              f"geometry, 1 request, warm best-of-3):", flush=True)
        for t in lens:
            prompt = rng.integers(0, VOCAB, (t,)).astype(np.int32)
            t0 = time.perf_counter()
            eng.submit(list(prompt), max_new_tokens=1).result()
            cold = time.perf_counter() - t0
            best = float("inf")
            for trial in range(3):
                p2 = ((prompt + trial + 1) % VOCAB).astype(np.int32)
                t1 = time.perf_counter()
                eng.submit(list(p2), max_new_tokens=1).result()
                best = min(best, time.perf_counter() - t1)
            print(f"  T={t:5d}: warm {best*1e3:8.1f} ms "
                  f"({t/best/1e3:.0f}k prefill tok/s; "
                  f"{-(-t//P)} chunks; cold {cold:.1f}s)", flush=True)
        # prefix-caching leg: a long registered prefix + a short
        # suffix should cost ~suffix chunks, not ~prompt chunks
        for t_pre in (1024, 1900):
            prefix = rng.integers(0, VOCAB, (t_pre,)).astype(np.int32)
            t0 = time.perf_counter()
            pid = eng.register_prefix(prefix)
            reg = time.perf_counter() - t0
            suf = rng.integers(0, VOCAB, (16,)).astype(np.int32)
            full = np.concatenate([prefix, suf])
            eng.submit(full, max_new_tokens=1, prefix_id=pid).result()
            best_p = best_c = float("inf")
            for trial in range(3):
                suf2 = ((suf + trial + 1) % VOCAB).astype(np.int32)
                f2 = np.concatenate([prefix, suf2])
                t1 = time.perf_counter()
                eng.submit(f2, max_new_tokens=1,
                           prefix_id=pid).result()
                best_p = min(best_p, time.perf_counter() - t1)
                t1 = time.perf_counter()
                eng.submit(f2, max_new_tokens=1).result()
                best_c = min(best_c, time.perf_counter() - t1)
            print(f"  prefix {t_pre:4d} + 16 suffix: TTFT "
                  f"{best_p*1e3:6.1f} ms vs cold {best_c*1e3:6.1f} ms "
                  f"(register {reg:.2f}s)", flush=True)
    finally:
        eng.shutdown()


if __name__ == "__main__":
    main()
