"""Flat decode-attention kernel cost decomposition (round-3 VERDICT #4).

Where do the ~15 us/call at gpt2 shapes go?  Sweeps batch (per-grid-
instance cost), valid (DMA/block count), and the C width (llama kv-
compact vs gpt2 full), reporting us/call from the chained-scan delta.
If cost is ~linear in B -> per-instance overhead dominates (grid
serialization); if ~linear in valid blocks -> DMA-bound (good); if flat
-> launch overhead.
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
from int8inferenceengine_tpu.ops import attention as A

KW = dict(scale_q=0.02, zp_q=120, scale_k=0.03, zp_k=130, scale_v=0.025,
          zp_v=125, scale_s=0.5, zp_s=100, scale_p=1 / 255, zp_p=0,
          scale_c=0.02, zp_c=128, rounding="trunc")


def bench(b, h, d, t, valid, k_short=256, k_long=2048):
    c = h * d
    rng = np.random.default_rng(0)
    q2 = jnp.asarray(rng.integers(0, 256, (b, c)), jnp.uint8)
    k3 = jnp.asarray(rng.integers(0, 256, (b, t, c)), jnp.uint8)
    v3 = jnp.asarray(rng.integers(0, 256, (b, t, c)), jnp.uint8)
    kw = dict(KW)
    kw["alpha"] = d ** -0.5

    def make(kk):
        @jax.jit
        def loop(qq):
            def body(carry, _):
                out = A.decode_attention_flat(
                    carry, k3, v3, jnp.int32(valid), n_heads=h,
                    backend="pallas", **kw)
                return carry ^ (out[0, 0] & jnp.uint8(1)), ()
            f, _ = lax.scan(body, qq, None, length=kk)
            return jnp.sum(f.astype(jnp.int32))
        return loop

    times = {}
    for kk in (k_short, k_long):
        loop = make(kk)
        int(loop(q2))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(loop(q2))
            best = min(best, time.perf_counter() - t0)
        times[kk] = best
    return (times[k_long] - times[k_short]) / (k_long - k_short)


def main():
    print("B-scaling at gpt2 geometry (H12 D64 C768, T512, valid 200):",
          flush=True)
    # known-good B=8 first: if an exotic small-B config wedges the
    # tunnel, the useful rows are already printed
    for b in (8, 4, 2, 1):
        us = bench(b, 12, 64, 512, 200) * 1e6
        print(f"  B={b}: {us:6.1f} us/call", flush=True)
    print("valid-scaling at B8 (block count 1/2/4):", flush=True)
    for valid in (64, 200, 512):
        us = bench(8, 12, 64, 512, valid) * 1e6
        print(f"  valid={valid}: {us:6.1f} us/call", flush=True)
    print("C-width at B8 valid 200 (kv-compact, TP shards, full):",
          flush=True)
    for h, d in ((2, 64), (3, 64), (4, 64), (6, 64), (12, 64)):
        try:
            us = bench(8, h, d, 512, 200) * 1e6
            print(f"  C={h*d}: {us:6.1f} us/call", flush=True)
        except Exception as e:                     # Mosaic lowering limit?
            print(f"  C={h*d}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()
