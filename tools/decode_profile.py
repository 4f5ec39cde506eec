"""Post-fix decode profile: where do the remaining ~0.7 ms/step go?"""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from int8inferenceengine_tpu import models, tensor
from int8inferenceengine_tpu.utils import observe
from __graft_entry__ import _load_random_weights

dec = models.build("gpt_tiny", vocab_size=50257, max_len=512,
                   dim=768, depth=12, heads=12)
_load_random_weights(dec)
rng = np.random.default_rng(0)
ids = rng.integers(0, 50257, (8, 64)).astype(np.int32)
dec.prepare(); dec(tensor(ids)); dec.convert()
print("converted", flush=True)
STEPS = 64
t0 = time.perf_counter(); dec.generate(ids, STEPS)
print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter(); dec.generate((ids + 1) % 50257, STEPS)
print(f"warm run ({STEPS} steps): {time.perf_counter()-t0:.2f}s", flush=True)
with observe.trace("decode", log_dir="/tmp/decode_trace2"):
    dec.generate((ids + 2) % 50257, STEPS)
ops = observe.device_op_times("/tmp/decode_trace2")
total = sum(v["ms"] for v in ops.values())
print(f"trace total: {total:.1f} ms over {STEPS} steps "
      f"= {total/STEPS*1e3:.0f} us/step(+prefill)", flush=True)
agg = {}
for name, v in ops.items():
    import re
    base = re.sub(r"[.\d]+$", "", name)
    a = agg.setdefault(base, {"ms": 0.0, "count": 0, "n": 0})
    a["ms"] += v["ms"]; a["count"] += v["count"]; a["n"] += 1
print("=== aggregated by op family (per-step us over %d steps) ===" % STEPS)
for base, a in sorted(agg.items(), key=lambda kv: -kv[1]["ms"]):
    if a["ms"] < 0.02: continue
    print(f"  {a['ms']:8.2f} ms  {a['ms']/STEPS*1e3:7.1f} us/step  x{a['count']:<6d} ({a['n']} variants) {base[:80]}", flush=True)
print("=== top individual ops ===")
for name, v in list(ops.items())[:40]:
    print(f"  {v['ms']:8.2f} ms  x{v['count']:<5d} {name[:110]}", flush=True)
