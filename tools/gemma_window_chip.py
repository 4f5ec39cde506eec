"""Round-5 on-chip validation: windowed/softcap kernel + gemma decode.

The round-4 session validated the sliding-window span ladder and the
kernel-tail ``jnp.tanh`` attention softcap in interpret mode only (the
tunnel died before a chip run).  This tool closes both:

(1) ``kernel`` leg — merged flat-kernel vs composed-XLA bit-exactness at
    T=2048, valid 1/300/1900, over the window x softcap grid
    (window None/512/128, softcap None/30.0), plus chained-scan per-call
    timing for each config.  PRIMARY question: does Mosaic lower the
    kernel-tail tanh softcap at all (documented escape hatch if not:
    ``decode_attention='xla'``).
(2) ``gemma`` leg — full gemma_tiny decode at the TODO geometry
    (768d / 12L / 12H / 2KV, sliding_window 256 on odd blocks,
    vocab 32k) under the (32, 384)-step scan-delta protocol, same as the
    llama leg in tools/llama_decode_tpu.py.

Usage: python tools/gemma_window_chip.py [kernel|gemma]
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
from int8inferenceengine_tpu.ops import attention as A
from __graft_entry__ import _load_random_weights

B, H, KV, T, D = 8, 12, 2, 2048, 64
C_KV = KV * D
KW = dict(scale_q=0.02, zp_q=120, scale_k=0.03, zp_k=130, scale_v=0.025,
          zp_v=125, scale_s=0.5, zp_s=100, scale_p=1 / 255, zp_p=0,
          scale_c=0.02, zp_c=128, alpha=D ** -0.5, rounding="trunc")


def kernel_leg():
    rng = np.random.default_rng(0)
    q2 = jnp.asarray(rng.integers(0, 256, (B, H * D)), jnp.uint8)
    k3 = jnp.asarray(rng.integers(0, 256, (B, T, C_KV)), jnp.uint8)
    v3 = jnp.asarray(rng.integers(0, 256, (B, T, C_KV)), jnp.uint8)

    def run(backend, valid, window, softcap):
        return np.asarray(A.decode_attention_flat(
            q2, k3, v3, jnp.int32(valid), n_heads=H, n_kv_heads=KV,
            backend=backend, window=window, softcap=softcap, **KW))

    for window in (None, 512, 128):
        for softcap in (None, 30.0):
            for valid in (1, 300, 1900):
                try:
                    o1 = run("xla", valid, window, softcap)
                    o2 = run("pallas", valid, window, softcap)
                except Exception as e:  # Mosaic lowering failures land here
                    print(f"W={window} cap={softcap} valid={valid}: "
                          f"FAILED {type(e).__name__}: {str(e)[:200]}",
                          flush=True)
                    continue
                print(f"W={window} cap={softcap} valid={valid}: "
                      f"bit-exact={bool((o1 == o2).all())} "
                      f"(ndiff {(o1 != o2).sum()})", flush=True)

    def bench(backend, window, softcap, k_short=256, k_long=2048):
        def make(kk):
            @jax.jit
            def loop(qq):
                def body(c, _):
                    out = A.decode_attention_flat(
                        c, k3, v3, jnp.int32(1900), n_heads=H,
                        n_kv_heads=KV, backend=backend, window=window,
                        softcap=softcap, **KW)
                    return c ^ (out[0, 0] & jnp.uint8(1)), ()
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

    for window in (None, 512, 128):
        for softcap in (None, 30.0):
            try:
                t = bench("pallas", window, softcap)
            except Exception as e:
                print(f"bench W={window} cap={softcap}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                continue
            print(f"pallas W={window} cap={softcap} valid=1900: "
                  f"{t*1e6:.1f} us/call", flush=True)


def gemma_leg():
    T_g = 512
    dec = models.build("gemma_tiny", vocab_size=32000, max_len=T_g,
                       dim=H * D, depth=12, heads=H, kv_heads=KV,
                       sliding_window=256,
                       config=QuantConfig(rounding="nearest"))
    _load_random_weights(dec)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 32000, (B, 64)).astype(np.int32)
    dec.prepare()
    dec(tensor(ids))
    t0 = time.perf_counter()
    dec.convert()
    print(f"convert: {time.perf_counter()-t0:.1f}s", flush=True)
    dtimes = {}
    for steps in (32, 384):
        t0 = time.perf_counter()
        dec.generate(ids, steps)
        print(f"steps={steps} compile+run: {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = float("inf")
        for trial in range(4):
            p2 = (ids + trial + 1) % 32000
            t1 = time.perf_counter()
            dec.generate(p2, steps)
            best = min(best, time.perf_counter() - t1)
        dtimes[steps] = best
    per = (dtimes[384] - dtimes[32]) / (384 - 32)
    print(f"RESULT gemma static: {per*1e3:.3f} ms/step -> "
          f"{B/per:.0f} tokens/s", flush=True)


if __name__ == "__main__":
    leg = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    if leg == "kernel":
        kernel_leg()
    else:
        gemma_leg()
