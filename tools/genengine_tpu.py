"""GenerationEngine on chip (CLAUDE.md TPU TODO #4): slot-based continuous
batching over the tunnel — correctness vs standalone generate() + rough
throughput at a mid-size decoder."""
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
from int8inferenceengine_tpu.serve import GenerationEngine
from __graft_entry__ import _load_random_weights


def main():
    print("backend:", jax.default_backend(), flush=True)
    dec = models.build("gpt_tiny", vocab_size=8192, max_len=256,
                       dim=512, depth=6, heads=8)
    _load_random_weights(dec)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 8192, (4, 32)).astype(np.int32)
    dec.prepare(); dec(tensor(ids)); dec.convert()

    # standalone oracle
    t0 = time.perf_counter()
    want = dec.generate(ids, 24)
    print(f"standalone generate compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)

    eng = GenerationEngine(dec, slots=4, chunk_steps=8)
    try:
        t0 = time.perf_counter()
        futs = [eng.submit(ids[i], max_new_tokens=24) for i in range(4)]
        outs = [f.result(timeout=600) for f in futs]
        dt = time.perf_counter() - t0
        ok = all(np.array_equal(outs[i], np.asarray(want)[i])
                 for i in range(4))
        print(f"engine == standalone: {ok}; first round {dt:.1f}s "
              f"(incl. engine compiles)", flush=True)
        assert ok
        # warm throughput round: 8 requests over 4 slots
        t0 = time.perf_counter()
        futs = [eng.submit(((ids[i % 4] + i) % 8192), max_new_tokens=24)
                for i in range(8)]
        [f.result(timeout=600) for f in futs]
        dt = time.perf_counter() - t0
        print(f"warm: 8 req x 24 tok in {dt:.2f}s = "
              f"{8*24/dt:.0f} tok/s; stats {eng.stats}", flush=True)
    finally:
        eng.shutdown()
    print("OK", flush=True)


if __name__ == "__main__":
    main()
