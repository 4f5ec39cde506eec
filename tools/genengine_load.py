"""GenerationEngine under load on chip (VERDICT r1 #7): gpt2-small-ish
decoder, slot engine at 3 load levels — tokens/s, latency p50/p99,
slot-fill.  ~10-15 min cold (generate/prefill compiles), warm after."""
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

eng = GenerationEngine(dec, slots=8, chunk_steps=16)
# warm the compiles: one round
futs = [eng.submit(rng.integers(0, 50257, 32), 16) for _ in range(8)]
[f.result() for f in futs]
print("engine warm", flush=True)

for n_req, max_new in ((4, 64), (8, 64), (24, 64)):
    # two rounds; report the second: admit grouping is timing-dependent,
    # so round 1 may still hit fresh (bucket, n) prefill compiles
    # (~10-50 s each over the tunnel; one-time per process)
    # warm round: admit grouping is timing-dependent, so it may hit
    # fresh (bucket, n) prefill compiles (~10-50 s each over the
    # tunnel; one-time per process)
    futs = [eng.submit(rng.integers(0, 50257, int(rng.integers(8, 33))),
                       max_new) for _ in range(n_req)]
    [f.result() for f in futs]
    # measured round: stats window == throughput window
    eng.stats.__init__()
    t0 = time.perf_counter()
    futs = [eng.submit(rng.integers(0, 50257, int(rng.integers(8, 33))),
                       max_new) for _ in range(n_req)]
    [f.result() for f in futs]
    t0 = time.perf_counter()
    futs = [eng.submit(rng.integers(0, 50257, int(rng.integers(8, 33))),
                       max_new) for _ in range(n_req)]
    outs = [f.result() for f in futs]
    dt = time.perf_counter() - t0
    toks = sum(len(o) for o in outs)
    lat = sorted(eng.stats.latencies_s)
    p50 = lat[len(lat) // 2]
    p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]
    fill = (eng.stats.chunk_slots_active
            / max(1, eng.stats.chunks * eng.slots))
    print(f"load {n_req:2d} req x {max_new} tok: {toks} tokens in "
          f"{dt:.2f}s = {toks/dt:.0f} tok/s; latency p50 {p50*1e3:.0f} ms "
          f"p99 {p99*1e3:.0f} ms; slot-fill {fill:.0%}", flush=True)
eng.shutdown()
print("OK", flush=True)
