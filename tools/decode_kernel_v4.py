"""On-chip A/B of the merged-dot flat decode kernel (round-4 VERDICT #1)
vs the per-block walk, plus bit-exactness vs the composed XLA oracle.

Protocol: chained-scan two-length delta (CLAUDE.md timing rules), one
v5e.  Run:  python tools/decode_kernel_v4.py
"""
import os as _os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from int8inferenceengine_tpu.ops import attention as A

KW = dict(scale_q=0.02, zp_q=120, scale_k=0.03, zp_k=130, scale_v=0.025,
          zp_v=125, scale_s=0.5, zp_s=100, scale_p=1 / 255, zp_p=0,
          scale_c=0.02, zp_c=128, rounding="trunc")


def mkdata(b, h, nkv, d, t, mq=1, seed=0):
    c = nkv * d
    rng = np.random.default_rng(seed)
    q2 = jnp.asarray(rng.integers(0, 256, (b, mq, h * d) if mq > 1
                                  else (b, h * d)), jnp.uint8)
    k3 = jnp.asarray(rng.integers(0, 256, (b, t, c)), jnp.uint8)
    v3 = jnp.asarray(rng.integers(0, 256, (b, t, c)), jnp.uint8)
    return q2, k3, v3


def check_exact(b, h, nkv, d, t, mq=1):
    q2, k3, v3 = mkdata(b, h, nkv, d, t, mq)
    kw = dict(KW, alpha=d ** -0.5)
    for valid in (1, 200, t - mq):
        va = jnp.int32(valid)
        out_m = A.decode_attention_flat(q2, k3, v3, va, n_heads=h,
                                        n_kv_heads=nkv, backend="pallas",
                                        merged=True, **kw)
        out_x = A.decode_attention_flat(q2, k3, v3, va, n_heads=h,
                                        n_kv_heads=nkv, backend="xla",
                                        **kw)
        eq = float(jnp.mean((out_m == out_x).astype(jnp.float32)))
        tag = "EXACT" if eq == 1.0 else f"MISMATCH {eq:.6f}"
        print(f"  exact h={h} kv={nkv} t={t} mq={mq} valid={valid}: {tag}")


def bench(b, h, nkv, d, t, valid, merged, mq=1, k_short=256, k_long=2048):
    q2, k3, v3 = mkdata(b, h, nkv, d, t, mq)
    kw = dict(KW, alpha=d ** -0.5)

    def make(kk):
        @jax.jit
        def loop(qq):
            def body(carry, _):
                out = A.decode_attention_flat(
                    carry, k3, v3, jnp.int32(valid), n_heads=h,
                    n_kv_heads=nkv, backend="pallas", merged=merged, **kw)
                if mq > 1:
                    perturb = out[0, 0, 0] & jnp.uint8(1)
                else:
                    perturb = out[0, 0] & jnp.uint8(1)
                return carry ^ perturb, ()
            f, _ = lax.scan(body, qq, None, length=kk)
            return jnp.sum(f.astype(jnp.int32))
        return loop

    times = {}
    for kk in (k_short, k_long):
        loop = make(kk)
        int(loop(q2))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            int(loop(q2))
            best = min(best, time.perf_counter() - t0)
        times[kk] = best
    return (times[k_long] - times[k_short]) / (k_long - k_short) * 1e6


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    print("== bit-exactness (merged kernel vs composed XLA, on chip) ==")
    check_exact(3, 12, 12, 64, 512)          # gpt2 MHA
    check_exact(3, 12, 2, 64, 512)           # llama GQA
    check_exact(3, 12, 2, 64, 512, mq=2)     # spec verify
    check_exact(3, 12, 2, 64, 2048)          # long cache
    print("== us/call: walk vs merged ==")
    for (tag, b, h, nkv, d, t, valid, mq) in [
        ("gpt2 C=768 v=64",  8, 12, 12, 64, 512, 64, 1),
        ("gpt2 C=768 v=128", 8, 12, 12, 64, 512, 128, 1),
        ("gpt2 C=768 v=512", 8, 12, 12, 64, 512, 511, 1),
        ("llama C=128 v=64", 8, 12, 2, 64, 512, 64, 1),
        ("llama C=128 v=128", 8, 12, 2, 64, 512, 128, 1),
        ("llama C=128 v=512", 8, 12, 2, 64, 512, 511, 1),
        ("gpt2 T=2048 v=1900", 8, 12, 12, 64, 2048, 1900, 1),
        ("llama mq=2 v=128", 8, 12, 2, 64, 512, 128, 2),
        ("B=1 gpt2 v=128", 1, 12, 12, 64, 512, 128, 1),
    ]:
        tw = bench(b, h, nkv, d, t, valid, merged=False, mq=mq)
        tm = bench(b, h, nkv, d, t, valid, merged=True, mq=mq)
        print(f"  {tag:22s} walk {tw:7.2f}  merged {tm:7.2f}  "
              f"({tw / tm:4.2f}x)")
