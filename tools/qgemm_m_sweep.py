"""Batch-M threshold sweep for qgemm auto rule: pallas vs xla per-call
device time at decode-relevant M on gpt2-small layer shapes."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from int8inferenceengine_tpu.ops import gemm_int8 as G
RNG = np.random.default_rng(0)

def bench_shape(m, k, n, backend, k_short=256, k_long=4096):
    a0 = jnp.asarray(RNG.integers(0, 256, (m, k)), jnp.uint8)
    w = jnp.asarray(RNG.integers(-127, 128, (k, n)), jnp.int8)
    oc = jnp.asarray(RNG.integers(-1000, 1000, (n,)), jnp.int32)
    kw = dict(scale_a=0.02, zp_a=128, scale_w=0.01, scale_c=0.05, zp_c=128)
    fn = G.qgemm_pallas if backend == "pallas" else G.qgemm_xla
    def make(kk):
        @jax.jit
        def loop(a):
            def body(c, _):
                out = fn(c, w, oc, **kw)
                bump = (out[0, 0].astype(jnp.uint8) & jnp.uint8(1))
                return c ^ bump, ()
            f, _ = lax.scan(body, a, None, length=kk)
            return jnp.sum(f.astype(jnp.int32))
        return loop
    times = {}
    for kk in (k_short, k_long):
        loop = make(kk)
        int(loop(a0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(loop(a0))
            best = min(best, time.perf_counter() - t0)
        times[kk] = best
    return (times[k_long] - times[k_short]) / (k_long - k_short)

print("backend:", jax.default_backend(), flush=True)
for (k, n) in [(768, 768), (768, 3072), (3072, 768)]:
    for m in (8, 16, 32, 64, 128):
        row = f"K={k} N={n} M={m}:"
        for be in ("pallas", "xla"):
            t = bench_shape(m, k, n, be)
            row += f" {be}={t*1e6:.1f}us"
        print(row, flush=True)
