"""Decode-shape qgemm microbench (CLAUDE.md TPU TODO #3): pallas vs xla
per-call time at M=8 (decode batch) on the gpt2-small layer shapes, plus a
batch-M sweep.  Chained-scan delta timing (lazy axon platform)."""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
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
                # data-dependent feedback without shape change: xor the
                # carry with a bit derived from the output
                bump = (out[0, 0].astype(jnp.uint8) & jnp.uint8(1))
                return c ^ bump, ()
            f, _ = lax.scan(body, a, None, length=kk)
            return jnp.sum(f.astype(jnp.int32))
        return loop

    times = {}
    for kk in (k_short, k_long):
        loop = make(kk)
        int(loop(a0))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(loop(a0))
            best = min(best, time.perf_counter() - t0)
        times[kk] = best
    per = (times[k_long] - times[k_short]) / (k_long - k_short)
    return per


def main():
    shapes = [(8, 768, 768), (8, 768, 3072), (8, 3072, 768),
              (8, 768, 50304)]
    print("backend:", jax.default_backend(), flush=True)
    for (m, k, n) in shapes:
        for be in ("pallas", "xla"):
            t = bench_shape(m, k, n, be)
            print(f"M={m} K={k} N={n} {be}: {t*1e6:.1f} us/call", flush=True)
    # M sweep on the square shape
    for m in (8, 32, 128, 512):
        for be in ("pallas", "xla"):
            t = bench_shape(m, 768, 768, be)
            print(f"sweep M={m} {be}: {t*1e6:.1f} us/call", flush=True)


if __name__ == "__main__":
    main()
