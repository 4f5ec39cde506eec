"""On-chip A/B of the optimized decode-attention kernel:
(1) bit-exactness vs composed XLA at gpt2 decode shapes (trunc),
(2) per-call kernel time, (3) full decode step time."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from int8inferenceengine_tpu.ops import attention as A

rng = np.random.default_rng(0)
B,H,T,D = 8,12,512,64
kw = dict(scale_q=0.02, zp_q=120, scale_k=0.03, zp_k=130, scale_v=0.025, zp_v=125,
          scale_s=0.5, zp_s=100, scale_p=1/255, zp_p=0, scale_c=0.02, zp_c=128,
          alpha=D**-0.5, rounding='trunc')
q = jnp.asarray(rng.integers(0,256,(B,H,1,D)), jnp.uint8)
k = jnp.asarray(rng.integers(0,256,(B,H,T,D)), jnp.uint8)
v = jnp.asarray(rng.integers(0,256,(B,H,T,D)), jnp.uint8)
for valid in (1, 200, T):
    o1 = np.asarray(A.decode_attention(q,k,v,valid,backend='xla',**kw))
    o2 = np.asarray(A.decode_attention(q,k,v,valid,backend='pallas',**kw))
    print(f"valid={valid} on-chip bit-exact: {(o1==o2).all()} "
          f"(ndiff {(o1!=o2).sum()})", flush=True)

# per-call time, chained scan
def bench(backend, k_short=256, k_long=2048):
    def make(kk):
        @jax.jit
        def loop(qq):
            def body(c, _):
                out = A.decode_attention(c, k, v, 200, backend=backend, **kw)
                return c ^ (out[0,0,0,0] & jnp.uint8(1)), ()
            f, _ = lax.scan(body, qq, None, length=kk)
            return jnp.sum(f.astype(jnp.int32))
        return loop
    times = {}
    for kk in (k_short, k_long):
        loop = make(kk)
        int(loop(q))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); int(loop(q)); best = min(best, time.perf_counter()-t0)
        times[kk] = best
    return (times[k_long]-times[k_short])/(k_long-k_short)

for be in ("pallas", "xla"):
    t = bench(be)
    print(f"decode_attention {be}: {t*1e6:.1f} us/call "
          f"(12 layers -> {12*t*1e3:.3f} ms/step)", flush=True)

# full decode step
from int8inferenceengine_tpu import models, tensor
from __graft_entry__ import _load_random_weights
dec = models.build("gpt_tiny", vocab_size=50257, max_len=512, dim=768, depth=12, heads=12)
_load_random_weights(dec)
ids = rng.integers(0, 50257, (8, 64)).astype(np.int32)
dec.prepare(); dec(tensor(ids)); dec.convert()
dtimes = {}
for steps in (16, 128):
    dec.generate(ids, steps)
    best = float("inf")
    for trial in range(2):
        p2 = (ids + trial + 1) % 50257
        t1 = time.perf_counter(); dec.generate(p2, steps)
        best = min(best, time.perf_counter() - t1)
    dtimes[steps] = best
per = (dtimes[128]-dtimes[16])/(128-16)
print(f"decode step: {per*1e3:.3f} ms/step -> {8/per:.0f} tok/s", flush=True)
