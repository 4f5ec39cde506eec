"""Sliding-window attention (mistral family): QuantSoftmax(window=),
the flat decode kernel's span ladder, LlamaDecoder(sliding_window=).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models
from int8inferenceengine_tpu.config import QuantConfig
from int8inferenceengine_tpu.ops import attention as attn_ops

PARAMS = dict(scale_q=0.021, zp_q=117, scale_k=0.034, zp_k=131,
              scale_v=0.027, zp_v=122, scale_s=0.48, zp_s=103,
              scale_p=1 / 255, zp_p=0, scale_c=0.024, zp_c=126)


@pytest.mark.parametrize("h,kv,t,mq,w", [
    (4, 4, 256, 1, 64), (4, 1, 256, 1, 96), (6, 2, 384, 3, 64),
    (4, 2, 2048, 1, 512)])
def test_windowed_kernel_matches_oracle(h, kv, t, mq, w):
    """The span-ladder kernel (interpret) must match the composed
    windowed oracle at every live length, including valid <= window
    (prefix case) and valid >> window (dynamic-start segment case)."""
    d = 64
    c = kv * d
    rng = np.random.default_rng(h * t + w)
    qshape = (3, mq, h * d) if mq > 1 else (3, h * d)
    qq = jnp.asarray(rng.integers(0, 256, qshape), jnp.uint8)
    k = jnp.asarray(rng.integers(0, 256, (3, t, c)), jnp.uint8)
    v = jnp.asarray(rng.integers(0, 256, (3, t, c)), jnp.uint8)
    kw = dict(PARAMS, alpha=d ** -0.5)
    for valid in (1, w // 2, w + 3, t - mq):
        want = np.asarray(attn_ops.decode_attention_flat(
            qq, k, v, jnp.int32(valid), n_heads=h, n_kv_heads=kv,
            backend="xla", window=w, rounding="trunc", **kw))
        got = np.asarray(attn_ops.decode_attention_flat(
            qq, k, v, jnp.int32(valid), n_heads=h, n_kv_heads=kv,
            backend="pallas", merged=True, window=w, interpret=True,
            rounding="trunc", **kw))
        assert (got == want).all(), valid


def test_out_of_window_probabilities_are_exact_zero_codes():
    """Out-of-window history must quantize to exactly zp_p — the same
    exact-zero contract as the causal upper bound (so windowed cached
    decode composes with the u8 KV cache unchanged)."""
    sm = q.layers.QuantSoftmax(causal=True, window=4)
    x = np.random.default_rng(0).normal(size=(1, 1, 12, 12)).astype(
        np.float32)
    sm.prepare()
    sm(q.tensor(x))
    sm.convert()
    codes = np.asarray(sm(q.Tensor(
        jnp.asarray(np.clip(np.round(x / 0.05) + 110, 0, 255),
                    jnp.uint8), 0.05, 110)).data)
    row, col = np.meshgrid(np.arange(12), np.arange(12), indexing="ij")
    dead = (col > row) | (col <= row - 4)
    assert (codes[0, 0][dead] == sm.zero_point).all()
    assert (codes[0, 0][~dead] != sm.zero_point).any()


def _built(w, geo=None):
    from __graft_entry__ import _load_random_weights
    geo = geo or dict(vocab_size=128, max_len=64, dim=64, depth=2,
                      heads=4, kv_heads=2)
    dec = models.build("llama_tiny", sliding_window=w,
                       config=QuantConfig(rounding="nearest"), **geo)
    _load_random_weights(dec)
    ids = np.random.default_rng(1).integers(
        0, geo["vocab_size"], (2, 12)).astype(np.int32)
    dec.prepare()
    dec(q.tensor(ids))
    dec.convert()
    return dec, ids


@pytest.mark.parametrize("w", [8, 16, 48])
def test_windowed_cached_decode_equals_recompute(w):
    """The cached-decode == full-forward-recompute invariant must hold
    with a window: prefill's windowed causal mask (QuantSoftmax) and
    the decode kernel's span ladder implement the same semantics."""
    dec, ids = _built(w)
    toks = np.asarray(dec.generate(ids, 20))
    longer = np.concatenate([ids, toks[:, :10]], 1)
    t2 = np.asarray(dec.generate(longer, 10))
    assert (t2 == toks[:, 10:20]).all()


def test_window_ge_max_len_equals_unwindowed():
    dec_w, ids = _built(1000)
    from __graft_entry__ import _load_random_weights
    dec = models.build("llama_tiny", vocab_size=128, max_len=64, dim=64,
                       depth=2, heads=4, kv_heads=2,
                       config=QuantConfig(rounding="nearest"))
    _load_random_weights(dec)
    dec.prepare()
    dec(q.tensor(ids))
    dec.convert()
    assert (np.asarray(dec_w.generate(ids, 20))
            == np.asarray(dec.generate(ids, 20))).all()


def test_window_actually_changes_attention():
    """A small window must change the model's output vs unwindowed
    (otherwise the mask is a no-op and the tests above prove nothing)."""
    dec_w, ids = _built(4)
    dec_u, _ = _built(1000)
    a = np.asarray(dec_w.generate(ids, 24))
    b = np.asarray(dec_u.generate(ids, 24))
    assert not (a == b).all()


def test_windowed_speculative_decode_target_exact():
    """Spec decode's multi-position verify (_extend_step) carries the
    window through fused_extend_attention — spec == greedy must hold."""
    from __graft_entry__ import _load_random_weights
    dec, ids = _built(16)
    draft = models.build("gpt_tiny", vocab_size=128, max_len=64, dim=32,
                         depth=1, heads=2)
    _load_random_weights(draft)
    draft.prepare()
    draft(q.tensor(ids))
    draft.convert()
    greedy = np.asarray(dec.generate(ids, 16))
    spec = np.asarray(dec.generate_speculative(draft, ids, 16, k=3))
    assert (spec == greedy).all()


def test_windowed_engine_matches_generate():
    from int8inferenceengine_tpu.serve.generation import GenerationEngine
    dec, ids = _built(12)
    eng = GenerationEngine(dec, slots=2, chunk_steps=4)
    try:
        futs = [eng.submit(ids[i], 10) for i in range(2)]
        outs = [f.result(timeout=300) for f in futs]
        for i in range(2):
            want = np.asarray(dec.generate(ids[i:i + 1], 10))[0]
            assert (outs[i] == want).all()
    finally:
        eng.shutdown()


def test_windowed_square_causal_with_valid_len_no_nan():
    """Square-causal + valid_len compose (right-padded prefill): the
    window must stay ROW-relative — a valid_len-relative lower bound
    would void every row < valid_len - window and NaN the softmax
    (round-4 review finding)."""
    sm = q.layers.QuantSoftmax(causal=True, window=4)
    x = np.random.default_rng(2).normal(size=(1, 1, 12, 12)).astype(
        np.float32)
    out = np.asarray(sm(q.tensor(x), valid_len=jnp.int32(9)).data)
    assert np.isfinite(out).all()
    # rows < valid_len still normalize over their causal window
    np.testing.assert_allclose(out[0, 0, :9].sum(-1), 1.0, rtol=1e-5)


def test_windowed_chunked_prefill_engine():
    """Window x chunked prefill x engine compose: the large-mq extend
    runs the composed windowed path (the VMEM auto-guard), the decode
    chunks run the span-ladder kernel — outputs must equal standalone
    generate()."""
    from int8inferenceengine_tpu.serve.generation import GenerationEngine
    dec, _ = _built(12, geo=dict(vocab_size=128, max_len=64, dim=64,
                                 depth=2, heads=4, kv_heads=2))
    eng = GenerationEngine(dec, slots=1, chunk_steps=4, prefill_chunk=8)
    rng = np.random.default_rng(17)
    prompt = rng.integers(0, 128, 21).astype(np.int32)   # 3 chunks
    try:
        got = eng.submit(prompt, 8).result(timeout=300)
        want = np.asarray(dec.generate(prompt[None, :], 8))[0]
        assert (got == want).all()
    finally:
        eng.shutdown()
