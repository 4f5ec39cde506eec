"""Headline benchmark: AlexNet/CIFAR10-224 INT8 inference throughput.

Reproduces the reference's headline workload (README.md:26-41: 224x224
images through AlexNet, batched) on one TPU chip and reports images/s.
Baseline: the reference engine's best INT8 number, 10,000 images in 36.6 s
on an i9-9900K = 273.2 img/s (BASELINE.md).

Methodology (important on this host): the TPU is reached through a lazy
remote platform — ``block_until_ready`` does NOT force execution, and
repeated dispatches with identical arguments can be elided entirely, so
naive timing loops report fantasy numbers.  We therefore (a) chain K
forwards inside ONE jitted ``lax.scan`` (each step's input depends on the
previous step's output — nothing can be skipped or reordered), (b) return
only a scalar reduction and force execution by fetching those 4 bytes, and
(c) measure at two scan lengths and use the difference, cancelling the
fixed dispatch/RPC overhead.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/s", "vs_baseline": N}
Extra detail (FP32 throughput, INT8 speedup) goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IMG_S = 10_000 / 36.6  # reference engine INT8, batch 100 (README.md:40)
BATCH = 100  # the reference's headline batch size; also this chip's sweet spot
K_SHORT, K_LONG = 2, 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_fwd(fwd, params, x0, batch, tag, k_short=K_SHORT, k_long=K_LONG):
    """Per-batch device time of ``fwd(params, x)`` via chained-scan delta
    timing — the one shared implementation (also used by bench_scaling.py)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make_loop(k):
        @jax.jit
        def loop(params, x):
            def body(carry, _):
                out = fwd(params, carry)
                nxt = carry + 1e-12 * jnp.sum(out.astype(jnp.float32))
                return nxt, ()
            final, _ = lax.scan(body, x, None, length=k)
            return jnp.sum(final)
        return loop

    times = {}
    for k in (k_short, k_long):
        loop = make_loop(k)
        float(loop(params, x0))                      # compile + first run
        float(loop(params, x0 * (1.0 + 1e-7)))       # warm-up pass (the
        # first post-compile dispatch over the tunnel runs cold: driver
        # runs measured 8% low until a second warm pass was added)
        best = float("inf")
        # 6 trials: a transient tunnel stall can poison a whole 4-trial
        # window (observed 2026-08-20: 52.4k img/s in one run, 62.0k on
        # the immediate repeat) — two extra minima are cheap insurance
        for trial in range(6):
            x = x0 * (1.0 + 1e-6 * (trial + 1))      # defeat arg-result caches
            t0 = time.perf_counter()
            float(loop(params, x))                   # scalar fetch forces exec
            best = min(best, time.perf_counter() - t0)
        times[k] = best
        log(f"  {tag} K={k}: {best*1e3:.1f} ms total")

    per_batch = (times[k_long] - times[k_short]) / (k_long - k_short)
    if per_batch <= 0:
        # dispatch noise swamped the delta (shapes too small for the host)
        log(f"  warning: non-positive scan delta ({per_batch:.2e}s); "
            f"using K={k_long} average instead")
        per_batch = times[k_long] / k_long
    img_s = batch / per_batch
    log(f"{tag}: {per_batch*1e3:.2f} ms/batch @ {batch} -> {img_s:.0f} img/s")
    return img_s


def measure(model, x0, tag):
    """Per-batch device time of a Module forward (chained-scan delta)."""
    from int8inferenceengine_tpu.tensor import Tensor

    def fwd(params, data):
        model._bind(params)
        try:
            return model._run(Tensor(data)).logical_data
        finally:
            model._bind(None)

    return measure_fwd(fwd, model._gather_params(), x0, BATCH, tag)


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: the big jitted-scan programs compile once per
    # machine, then every later bench run (and the driver's) is warm.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, "/root/repo")
    from int8inferenceengine_tpu import models
    from int8inferenceengine_tpu.config import QuantConfig
    from __graft_entry__ import _calibrated, _load_random_weights

    log("backend:", jax.default_backend(), jax.devices())

    x0 = jax.device_put(jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (BATCH, 3, 224, 224)).astype(np.float32)))

    m_int8 = _calibrated(models.build("alexnet"), models.AlexNet.INPUT_SHAPE)
    int8_img_s = measure(m_int8, x0, "INT8")

    # FP32 comparison doubles the (tunnel-slow) cold-compile cost; opt in.
    # Documented measurement: FP32 4.96 ms/batch = 51,634 img/s -> INT8 1.37x.
    if os.environ.get("BENCH_FP32"):
        m_fp32 = models.build("alexnet")
        _load_random_weights(m_fp32)
        fp32_img_s = measure(m_fp32, x0, "FP32")
        log(f"INT8 speedup over FP32 (same chip): "
            f"{int8_img_s / fp32_img_s:.2f}x")

    # u8 host-ingest leg (+first-conv space-to-depth pre-layout); opt in.
    # Documented measurement (batch 256): 2.75 ms/batch = 93,010 img/s.
    if os.environ.get("BENCH_INGEST"):
        from int8inferenceengine_tpu import native
        from int8inferenceengine_tpu.data import wrap_quantized
        from int8inferenceengine_tpu.ops import functional as F
        from int8inferenceengine_tpu.tensor import Tensor

        cfg = m_int8.config
        desc = m_int8.ingest_descriptor()
        xq = native.quantize_u8(np.asarray(x0), cfg.input_scale,
                                cfg.input_zero_point)
        t0 = wrap_quantized(xq, cfg.input_scale, cfg.input_zero_point, desc)

        def fwd_q(params, data):
            m_int8._bind(params)
            try:
                out = m_int8.forward(Tensor(data, cfg.input_scale,
                                            cfg.input_zero_point,
                                            _ingest=desc))
                return F.dequantize(out).logical_data
            finally:
                m_int8._bind(None)

        import jax as _jax
        from jax import lax as _lax

        def make_loop(k):
            @_jax.jit
            def loop(params, x):
                def body(c, _):
                    out = fwd_q(params, c)
                    bump = (jnp.sum(out.astype(jnp.float32))
                            .astype(jnp.int32) % 2)
                    return jnp.where(bump < 2, c, jnp.zeros_like(c)), ()
                f, _ = _lax.scan(body, x, None, length=k)
                return jnp.sum(f.astype(jnp.float32))
            return loop

        params = m_int8._gather_params()
        d = jax.device_put(t0.data)
        times = {}
        for k in (K_SHORT, K_LONG):
            loop = make_loop(k)
            float(loop(params, d))
            best = float("inf")
            for _ in range(2):
                t1 = time.perf_counter()
                float(loop(params, d))
                best = min(best, time.perf_counter() - t1)
            times[k] = best
        per = (times[K_LONG] - times[K_SHORT]) / (K_LONG - K_SHORT)
        log(f"INT8 u8-ingest (host s2d): {per*1e3:.2f} ms/batch "
            f"-> {BATCH/per:.0f} img/s")

    # Autoregressive decode leg (gpt2-small-ish, u8 KV cache) — ON by
    # default (BENCH_DECODE=0 to skip).  History (one v5e, b8):
    # 3.88 ms/step round 1 -> 1.158 (decode-attention kernel) -> 0.551
    # (small-M qgemm dispatch + fuse_qkv + block-diagonal kernel).
    decode_tok_s = None
    decode_ms_step = None
    if os.environ.get("BENCH_DECODE", "1") != "0":
        db = int(os.environ.get("BENCH_DECODE_BATCH", "8"))
        dec = models.build("gpt_tiny", vocab_size=50257, max_len=512,
                           dim=768, depth=12, heads=12)
        _load_random_weights(dec)
        dec.prepare()
        ids = np.random.default_rng(0).integers(
            0, 50257, size=(db, 64)).astype(np.int32)
        from int8inferenceengine_tpu import tensor as _tensor
        dec(_tensor(ids))
        dec.convert()
        dtimes = {}
        for steps in (16, 128):
            dec.generate(ids, steps)                    # compile
            best = float("inf")
            for trial in range(3):
                p2 = (ids + trial + 1) % 50257
                t1 = time.perf_counter()
                dec.generate(p2, steps)
                best = min(best, time.perf_counter() - t1)
            dtimes[steps] = best
        per_step = (dtimes[128] - dtimes[16]) / (128 - 16)
        decode_ms_step = round(per_step * 1e3, 3)
        decode_tok_s = round(db / per_step, 1)
        log(f"decode (gpt2-small-ish, b{db}): {per_step*1e3:.3f} ms/step "
            f"-> {db/per_step:.0f} tokens/s")

    # llama-family decode leg (GQA kv-compact cache + SwiGLU; 768d/12H/
    # 2KV, vocab 32000) — the modern-LM serving geometry.  Measured
    # 2026-08-20 (one v5e, b8): 0.107 ms/step = 74.7k tok/s with the GQA
    # flat kernel ('auto'); composed-XLA 0.214; see
    # tools/llama_decode_tpu.py.  BENCH_LLAMA=0 to skip.
    llama_tok_s = None
    llama_ms_step = None
    if os.environ.get("BENCH_LLAMA", "1") != "0":
        db = int(os.environ.get("BENCH_DECODE_BATCH", "8"))
        ldec = models.build("llama_tiny", vocab_size=32000, max_len=512,
                            dim=768, depth=12, heads=12, kv_heads=2,
                            config=QuantConfig(rounding="nearest"))
        _load_random_weights(ldec)
        ldec.prepare()
        ids = np.random.default_rng(0).integers(
            0, 32000, size=(db, 64)).astype(np.int32)
        from int8inferenceengine_tpu import tensor as _tensor
        ldec(_tensor(ids))
        ldec.convert()
        # (32, 384) scan pair: at ~0.1-0.2 ms/step the (16, 128)
        # delta's noise floor is +-15-20 us/step (wall jitter / 112);
        # 352 delta steps cut it 3x (llama_decode_tpu.py note).
        dtimes = {}
        for steps in (32, 384):
            ldec.generate(ids, steps)                   # compile
            best = float("inf")
            for trial in range(3):
                p2 = (ids + trial + 1) % 32000
                t1 = time.perf_counter()
                ldec.generate(p2, steps)
                best = min(best, time.perf_counter() - t1)
            dtimes[steps] = best
        per_step = (dtimes[384] - dtimes[32]) / (384 - 32)
        llama_ms_step = round(per_step * 1e3, 3)
        llama_tok_s = round(db / per_step, 1)
        log(f"llama decode (768d/12H/2KV, b{db}): {per_step*1e3:.3f} "
            f"ms/step -> {db/per_step:.0f} tokens/s")

    # llama W4A8 leg (round 4): 4-bit weights on the static u8
    # activation path (ops/w4.py v2 kernel, merged qkv/gate-up calls,
    # g=256 — accuracy-neutral vs g=128 and ~5% faster, measured
    # 2026-08-20: 0.433 ms/step, beats W8-float's 0.448 at half the
    # weight bytes).  BENCH_W4A8=0 to skip.
    w4a8_tok_s = None
    w4a8_ms_step = None
    if os.environ.get("BENCH_W4A8", "1") != "0":
        db = int(os.environ.get("BENCH_DECODE_BATCH", "8"))
        wdec = models.build("llama_tiny", vocab_size=32000, max_len=512,
                            dim=768, depth=12, heads=12, kv_heads=2,
                            config=QuantConfig(rounding="nearest",
                                               weight_bits=4,
                                               w4_group=256))
        _load_random_weights(wdec)
        wdec.prepare()
        ids = np.random.default_rng(0).integers(
            0, 32000, size=(db, 64)).astype(np.int32)
        from int8inferenceengine_tpu import tensor as _tensor
        wdec(_tensor(ids))
        wdec.convert()
        dtimes = {}
        for steps in (32, 384):
            wdec.generate(ids, steps)                   # compile
            best = float("inf")
            for trial in range(3):
                p2 = (ids + trial + 1) % 32000
                t1 = time.perf_counter()
                wdec.generate(p2, steps)
                best = min(best, time.perf_counter() - t1)
            dtimes[steps] = best
        per_step = (dtimes[384] - dtimes[32]) / (384 - 32)
        w4a8_ms_step = round(per_step * 1e3, 3)
        w4a8_tok_s = round(db / per_step, 1)
        log(f"llama W4A8 decode (g=256, b{db}): {per_step*1e3:.3f} "
            f"ms/step -> {db/per_step:.0f} tokens/s")

    # Serving-engine leg (round 5, VERDICT #5: driver-pin the serving
    # throughput).  Fixed protocol: the BENCH_DECODE gpt2-small-ish
    # geometry, 8 slots, chunk_steps=32, sync_chunks=8 (the measured
    # saturated-load optimum), 16 requests x 24-token prompts x 256 new
    # tokens (the regime where multi-chunk syncing pays).  One full
    # warm round (compiles the bucket prefills + both chunk programs),
    # then tok/s = delivered new tokens / wall seconds, best of 2.
    # BENCH_ENGINE=0 to skip.
    engine_tok_s = None
    if (os.environ.get("BENCH_ENGINE", "1") != "0"
            and os.environ.get("BENCH_DECODE", "1") != "0"):
        from int8inferenceengine_tpu.serve import GenerationEngine
        eng = GenerationEngine(dec, slots=8, chunk_steps=32,
                               sync_chunks=8)
        try:
            rng_e = np.random.default_rng(7)
            prompts = [rng_e.integers(0, 50257, (24,)).astype(np.int32)
                       for _ in range(16)]

            def round_once():
                t1 = time.perf_counter()
                futs = [eng.submit(p, 256) for p in prompts]
                ntok = sum(len(f.result()) for f in futs)
                return ntok / (time.perf_counter() - t1)

            round_once()                       # warm / compile
            engine_tok_s = round(max(round_once() for _ in range(2)), 1)
            log(f"engine (8 slots, chunk 32, sync 8, 16x256 new tok): "
                f"{engine_tok_s:.0f} tokens/s")
        finally:
            eng.shutdown()

    from int8inferenceengine_tpu.utils import roofline
    rl = roofline.report(m_int8, models.AlexNet.INPUT_SHAPE, BATCH,
                         measured_s=BATCH / int8_img_s)
    log(f"roofline: {rl['total_flops']/1e9:.1f} GOP/batch, achieved "
        f"{rl['achieved_ops']/1e12:.1f} TOP/s = {rl['percent_of_peak']:.1f}% "
        f"of int8 peak ({rl['percent_of_sol']:.0f}% of speed-of-light)")

    rec = {
        "metric": "alexnet_cifar10_224_int8_throughput_1chip",
        "value": round(int8_img_s, 1),
        "unit": "images/s",
        "vs_baseline": round(int8_img_s / BASELINE_IMG_S, 2),
    }
    if decode_tok_s is not None:
        rec["decode_tokens_per_s_b8"] = decode_tok_s
        rec["decode_ms_per_step"] = decode_ms_step
    if llama_tok_s is not None:
        rec["llama_decode_tokens_per_s_b8"] = llama_tok_s
        rec["llama_decode_ms_per_step"] = llama_ms_step
    if w4a8_tok_s is not None:
        rec["llama_w4a8_tokens_per_s_b8"] = w4a8_tok_s
        rec["llama_w4a8_ms_per_step"] = w4a8_ms_step
    if engine_tok_s is not None:
        rec["engine_tokens_per_s"] = engine_tok_s
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
