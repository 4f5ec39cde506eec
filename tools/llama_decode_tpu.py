"""On-chip llama-family decode evidence (round-3 VERDICT #2/#3).

(1) GQA flat-kernel bit-exactness vs the composed XLA path at the
    llama-7B-ish-scaled geometry (768d / 12 query heads / 2 kv heads,
    kv-compact cache rows 128 wide -> kernel-eligible), valid 1/200/512;
(2) per-call kernel time pallas vs xla (chained scan delta);
(3) full llama decode step (ms/step, tok/s b8) in the mode named by
    argv[1]: static (INT8 W8A8), wo8 (W8 weight-only), w4.

Usage: python tools/llama_decode_tpu.py [static|wo8|w4|kernel]
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

B, H, KV, T, D = 8, 12, 2, 512, 64
C_KV = KV * D                                    # 128: kernel-eligible
KW = dict(scale_q=0.02, zp_q=120, scale_k=0.03, zp_k=130, scale_v=0.025,
          zp_v=125, scale_s=0.5, zp_s=100, scale_p=1 / 255, zp_p=0,
          scale_c=0.02, zp_c=128, alpha=D ** -0.5, rounding="trunc")

MODES = {
    "static": QuantConfig(rounding="nearest"),
    # in-model kernel A/B at the GQA geometry (which attention path wins
    # INSIDE the scan is a different question from the standalone
    # microbench — the gpt2 study showed exactly that)
    "static_xla": QuantConfig(rounding="nearest", decode_attention="xla"),
    "static_pallas": QuantConfig(rounding="nearest",
                                 decode_attention="pallas"),
    "wo8": QuantConfig(weight_only=True),
    "dyn": QuantConfig(weight_only=True, dynamic_act=True),
    "w4": QuantConfig(weight_only=True, weight_bits=4),
    # W4A8 (round 4): 4-bit weights on the STATIC u8 activation path —
    # half the weight bytes of 'static' with the same u8 glue
    "w4a8": QuantConfig(weight_bits=4, rounding="nearest"),
    # MoE (moe_tiny at the same attention geometry, E=4 top-2): dense
    # dispatch reads ALL expert weights every step — expect ~E/top_k x
    # the dense-MLP weight traffic; the measured number calibrates that
    # trade-off honestly.
    "moe": QuantConfig(rounding="nearest"),
}


def kernel_leg():
    rng = np.random.default_rng(0)
    q2 = jnp.asarray(rng.integers(0, 256, (B, H * D)), jnp.uint8)
    k3 = jnp.asarray(rng.integers(0, 256, (B, T, C_KV)), jnp.uint8)
    v3 = jnp.asarray(rng.integers(0, 256, (B, T, C_KV)), jnp.uint8)
    for valid in (1, 200, T):
        o1 = np.asarray(A.decode_attention_flat(
            q2, k3, v3, jnp.int32(valid), n_heads=H, n_kv_heads=KV,
            backend="xla", **KW))
        o2 = np.asarray(A.decode_attention_flat(
            q2, k3, v3, jnp.int32(valid), n_heads=H, n_kv_heads=KV,
            backend="pallas", **KW))
        print(f"GQA valid={valid} on-chip bit-exact: {(o1 == o2).all()} "
              f"(ndiff {(o1 != o2).sum()})", flush=True)

    def bench(backend, k_short=256, k_long=2048):
        def make(kk):
            @jax.jit
            def loop(qq):
                def body(c, _):
                    out = A.decode_attention_flat(
                        c, k3, v3, jnp.int32(200), n_heads=H,
                        n_kv_heads=KV, backend=backend, **KW)
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

    for be in ("pallas", "xla"):
        t = bench(be)
        print(f"GQA decode_attention_flat {be}: {t*1e6:.1f} us/call "
              f"(12 layers -> {12*t*1e3:.3f} ms/step)", flush=True)


def decode_leg(mode):
    cfg = MODES[mode]
    family = "moe_tiny" if mode == "moe" else "llama_tiny"
    kw = dict(n_experts=4, top_k=2) if mode == "moe" else {}
    dec = models.build(family, vocab_size=32000, max_len=T,
                       dim=H * D, depth=12, heads=H, kv_heads=KV,
                       config=cfg, **kw)
    _load_random_weights(dec)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 32000, (B, 64)).astype(np.int32)
    if not cfg.weight_only:
        dec.prepare()
        dec(tensor(ids))
    t0 = time.perf_counter()
    dec.convert()
    print(f"convert: {time.perf_counter()-t0:.1f}s", flush=True)
    # (32, 384): at ~0.1 ms/step the old (16, 128) delta had a
    # +-15-20 us/step noise floor (2 ms wall jitter / 112 steps) — the
    # morning/afternoon 0.107-0.190 "regression" chase of 2026-08-20
    # was exactly that noise; 352 delta steps cut it 3x.
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
    print(f"RESULT llama {mode}: {per*1e3:.3f} ms/step -> "
          f"{B/per:.0f} tokens/s", flush=True)


if __name__ == "__main__":
    leg = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    if leg == "kernel":
        kernel_leg()
    else:
        decode_leg(leg)
