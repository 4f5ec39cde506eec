"""gpt2/MHA decode-attention floor study (round-4 VERDICT #3).

The model-level profile (tools/decode_profile.py, 2026-08-21) puts the
12 merged-kernel calls at 113.5 us/step (9.5 us/call at bench valids
64..190) against a ~1.4 us/call live-cache DMA bound — attention is
the only component of the 0.377 ms gpt2 step still far off its bound
(GEMM fusions measure 164 us vs a ~160 us weight-read bound; glue
~50 us).  This tool decomposes the kernel's per-call cost at the MHA
geometry (H12 D64 C768, T512, rows=8 -> ONE grid instance):

  * valid sweep 1..512: the valid=1 point IS the fixed per-call cost
    (DMA-latency + 2 small dots + the serial VPU softmax/extract tail);
    the slope is the DMA/compute cost per live block.
  * rows=8 vs rows=1 (8 instances): instance-issue overhead.
  * merged vs walk vs composed XLA at the same points, for context.
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


def bench(b, h, d, t, valid, merged=True, backend="pallas", rows=None,
          k_short=256, k_long=2048):
    c = h * d
    rng = np.random.default_rng(0)
    q2 = jnp.asarray(rng.integers(0, 256, (b, c)), jnp.uint8)
    k3 = jnp.asarray(rng.integers(0, 256, (b, t, c)), jnp.uint8)
    v3 = jnp.asarray(rng.integers(0, 256, (b, t, c)), jnp.uint8)
    kw = dict(KW)
    kw["alpha"] = d ** -0.5
    orig = A._pick_rows
    if rows is not None:
        A._pick_rows = lambda *a, **k: rows
    try:
        def make(kk):
            @jax.jit
            def loop(qq):
                def body(carry, _):
                    out = A.decode_attention_flat(
                        carry, k3, v3, jnp.int32(valid), n_heads=h,
                        backend=backend, merged=merged, **kw)
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
    finally:
        A._pick_rows = orig


def main():
    print("valid sweep, merged kernel, rows=8 (H12 D64 C768 T512 b8):",
          flush=True)
    for v in (1, 64, 128, 256, 384, 512):
        us = bench(8, 12, 64, 512, v) * 1e6
        print(f"  valid={v:4d}: {us:6.1f} us/call", flush=True)
    print("rows A/B at valid 128/384:", flush=True)
    for v in (128, 384):
        for r in (8, 4, 1):
            us = bench(8, 12, 64, 512, v, rows=r) * 1e6
            print(f"  valid={v} rows={r}: {us:6.1f} us/call", flush=True)
    print("walk kernel + composed XLA context:", flush=True)
    for v in (128, 384):
        usw = bench(8, 12, 64, 512, v, merged=False) * 1e6
        usx = bench(8, 12, 64, 512, v, backend="xla") * 1e6
        print(f"  valid={v}: walk {usw:6.1f}  xla {usx:6.1f} us/call",
              flush=True)


if __name__ == "__main__":
    main()
