"""LlamaDecoder: RMSNorm / RoPE / GQA / SwiGLU INT8 LM.

The inherited invariant must survive every architectural change: cached
greedy decoding (post-RoPE k codes in a kv-compact T-major cache) is
BIT-IDENTICAL to re-running the full causal INT8 forward each step —
RoPE's angles come from the same static inv_freq on both paths, and GQA
grouping is exact integer math on either path."""

import numpy as np
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models
from int8inferenceengine_tpu.models.llama import LlamaDecoder, torch_llama


def _built(config=None, **kw):
    kw.setdefault("kv_heads", 2)
    m = LlamaDecoder(config=config or QuantConfig(), **kw)
    tw = torch_llama(**kw)
    m.load(tw.state_dict())
    return m, tw


def _ids(b, t, seed=0):
    return np.random.default_rng(seed).integers(
        0, 1000, size=(b, t)).astype(np.int32)


def _calibrated(m, seed=1):
    m.prepare()
    m(q.tensor(_ids(8, 64, seed)))
    m.convert()
    return m


def test_fp32_parity_vs_torch():
    m, tw = _built()
    ids = _ids(4, 24)
    want = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    got = m(q.tensor(ids)).numpy()
    assert got.shape == want.shape == (4, 24, 1000)
    assert np.abs(got - want).max() < 2e-4, np.abs(got - want).max()


def test_fp32_parity_mha_and_gqa4():
    # kv_heads == heads (MHA degenerate case) and 4-way grouping
    for kv in (4, 1):
        m, tw = _built(kv_heads=kv)
        ids = _ids(2, 16, seed=kv)
        want = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
        got = m(q.tensor(ids)).numpy()
        assert np.abs(got - want).max() < 2e-4, (kv, np.abs(got - want).max())


def test_int8_next_token_agreement():
    """Round-3 root cause of the old 0.6875 failure (diagnosed, not
    deleted): the llama block has ~2x the requant boundaries of the gpt
    block (2 RoPE layers, QuantMul, 2 RMSNorms per block), so the default
    'trunc' rounding's -s/2 per-boundary DC bias compounds ~4x harder —
    logit rms error 0.066 vs 0.016 under 'nearest' on this toy, while the
    untrained toy's FP32 top1-top2 margins sit at median 0.058 (every
    disagreeing sequence had margin 0.016-0.051 < the trunc noise floor;
    every margin > 0.07 agreed).  Per the depth-study decision the
    many-boundary configuration for llama-family accuracy is
    rounding='nearest' (Module.convert warns under plain 'trunc'); with
    it, agreement on the same 16 sequences is exact."""
    m, tw = _built(config=QuantConfig(rounding="nearest"))
    _calibrated(m)
    ids = _ids(16, 32, seed=3)
    want = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    got = m(q.tensor(ids)).numpy()
    assert np.isfinite(got).all()
    agree = (got[:, -1].argmax(-1) == want[:, -1].argmax(-1)).mean()
    assert agree == 1.0, agree


def test_trunc_bias_diagnosis_pinned():
    """Pins the measured cause: default 'trunc' logit rms error is >2.5x
    the 'nearest' error on the identical toy/calibration/eval (measured
    4.1x on CPU) — the compounding truncation bias, not activation
    outliers (per-channel amax max/median <= 2.6 on this toy; smoothing
    moved the error <2%)."""
    ids = _ids(16, 32, seed=3)
    errs = {}
    for rounding in ("trunc", "nearest"):
        m, tw = _built(config=QuantConfig(rounding=rounding))
        _calibrated(m)
        want = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
        got = m(q.tensor(ids)).numpy()
        errs[rounding] = float(np.sqrt(
            ((got[:, -1] - want[:, -1]) ** 2).mean()))
    assert errs["trunc"] > 2.5 * errs["nearest"], errs


def test_convert_warns_trunc_depth():
    """llama_tiny (39 boundaries) under plain default 'trunc' earns the
    TruncDepthWarning advisory; 'nearest' converts silently."""
    import warnings as _w

    m, _ = _built()
    m.prepare(); m(q.tensor(_ids(2, 16, 1)))
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        m.convert()
    assert any(isinstance(w.message, q.TruncDepthWarning) for w in rec)

    m2, _ = _built(config=QuantConfig(rounding="nearest"))
    m2.prepare(); m2(q.tensor(_ids(2, 16, 1)))
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        m2.convert()
    assert not any(isinstance(w.message, q.TruncDepthWarning) for w in rec)


def test_cached_decode_bit_identical_to_full_forward():
    """generate() (prefill + kv-compact u8 cache scan, RoPE at each pos)
    == greedy recompute with the full causal forward, token for token."""
    m, _ = _built()
    _calibrated(m)
    b, t0, steps = 3, 7, 9
    prompt = _ids(b, t0, seed=5)
    got = m.generate(prompt, steps)
    assert got.shape == (b, steps)

    seq = prompt.copy()
    for s in range(steps):
        logits = m(q.tensor(seq)).numpy()
        nxt = logits[:, -1].argmax(-1).astype(np.int32)
        np.testing.assert_array_equal(got[:, s], nxt, f"step {s}")
        seq = np.concatenate([seq, nxt[:, None]], axis=1)


def test_cache_is_kv_compact_uint8():
    """The cache stores kv_heads*head_dim-wide u8 rows (not heads-wide)."""
    m, _ = _built()
    _calibrated(m)
    ids = q.tensor(_ids(2, 5, seed=7))
    import jax.numpy as jnp
    from int8inferenceengine_tpu.tensor import Tensor
    _, cache = m._prefill(Tensor(jnp.asarray(ids.data)))
    k1, v1 = cache[1]
    assert k1.dtype == jnp.uint8 and v1.dtype == jnp.uint8
    assert k1.shape == (2, m.max_len, m.kv_heads * m.head_dim)


def test_weight_only_generate_matches_recompute():
    """Float-cache decode path (repeat_kv on the head-split cache)."""
    m, _ = _built(config=QuantConfig(weight_only=True))
    _calibrated(m)
    b, t0, steps = 2, 6, 5
    prompt = _ids(b, t0, seed=11)
    got = m.generate(prompt, steps)
    seq = prompt.copy()
    for s in range(steps):
        logits = m(q.tensor(seq)).numpy()
        nxt = logits[:, -1].argmax(-1).astype(np.int32)
        np.testing.assert_array_equal(got[:, s], nxt, f"step {s}")
        seq = np.concatenate([seq, nxt[:, None]], axis=1)


def test_registry_builds():
    m = models.build("llama_tiny", config=QuantConfig())
    tw = models.torch_twin("llama_tiny")
    m.load(tw.state_dict())
    ids = _ids(2, 8)
    want = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    got = m(q.tensor(ids)).numpy()
    assert np.abs(got - want).max() < 2e-4


def test_checkpoint_roundtrip_quantized(tmp_path):
    """Quantized-artifact round-trip (utils.save/load): a fresh
    LlamaDecoder restored from disk is bit-identical on forward AND on
    cached-decode generate() — GQA cache geometry, RoPE tables, and the
    kv-compact scales all reconstruct from the artifact."""
    from int8inferenceengine_tpu import utils
    m, _ = _built()
    _calibrated(m)
    ids = _ids(3, 12, seed=13)
    base = m(q.tensor(ids)).numpy()
    base_toks = m.generate(ids, 7)

    path = str(tmp_path / "llama_int8.npz")
    utils.save(m, path)
    fresh = models.build("llama_tiny", config=QuantConfig())
    utils.load(fresh, path)
    assert fresh.is_quant
    np.testing.assert_array_equal(fresh(q.tensor(ids)).numpy(), base)
    np.testing.assert_array_equal(fresh.generate(ids, 7), base_toks)


def test_engine_matches_generate_gqa():
    """GenerationEngine over the GQA kv-compact cache: per-request tokens
    == standalone generate() (slot cache rows are [T, Hkv*D])."""
    from int8inferenceengine_tpu.serve import GenerationEngine
    m, _ = _built()
    _calibrated(m)
    eng = GenerationEngine(m, slots=2, chunk_steps=4)
    rng = np.random.default_rng(17)
    reqs = []
    for t0, max_new in [(5, 6), (12, 3), (3, 8), (9, 5)]:
        prompt = rng.integers(0, 1000, t0).astype(np.int32)
        reqs.append((prompt, max_new, eng.submit(prompt, max_new)))
    try:
        for prompt, max_new, fut in reqs:
            got = fut.result(timeout=120)
            want = m.generate(prompt[None, :], max_new)[0]
            np.testing.assert_array_equal(got, want)
    finally:
        eng.shutdown()


def test_tp_bit_exact_4x2():
    """Transformer TP on the llama block at mesh (4, 2) — model axis 2:
    col_local QKV with head-local GQA (both head counts divide the model
    axis: 4 heads / 2 kv over ms=2), row-parallel proj/down, col_local
    gate/up with the SwiGLU interior on local shards.  Forward AND
    generate() bit-exact vs unsharded."""
    from int8inferenceengine_tpu.parallel.mesh import make_mesh
    m, _ = _built(max_len=32)
    _calibrated(m)
    ids = _ids(4, 12, seed=19)
    want = m(q.tensor(ids)).numpy()
    want_toks = m.generate(ids, 10)
    m.shard(make_mesh((4, 2)))
    assert m.wq1._tp_local and m.proj1._tp_row
    assert m.gate1._tp_local and m.down1._tp_row
    got = m(q.tensor(ids)).numpy()
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(m.generate(ids, 10), want_toks)


def test_tp_head_fallback_kv_not_divisible():
    """kv_heads=1 (MQA) cannot head-shard on ms=2: QKV fall back to
    gathered column-parallel, row-parallel MLP still engages, and the
    forward stays bit-exact."""
    from int8inferenceengine_tpu.parallel.mesh import make_mesh
    m, _ = _built(kv_heads=1)
    _calibrated(m)
    ids = _ids(4, 12, seed=23)
    want = m(q.tensor(ids)).numpy()
    m.shard(make_mesh((4, 2)))
    assert not m.wq1._tp_local
    assert m.down1._tp_row
    got = m(q.tensor(ids)).numpy()
    np.testing.assert_array_equal(got, want)


def test_rope_scaling_linear_and_ntk():
    """Context-extension RoPE scaling: linear interpolation maps
    position p onto the unscaled checkpoint's p/f angles exactly; NTK
    rescales the base (high frequencies ~unchanged, low stretched);
    and the cached-decode == full-forward invariant survives scaling
    (angles stay a static function of position)."""
    import jax.numpy as jnp
    from int8inferenceengine_tpu.ops.rope import rope_angles

    c1, s1 = rope_angles(jnp.arange(0, 32, 2), 64, scaling=("linear", 2))
    c2, s2 = rope_angles(jnp.arange(0, 16), 64)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)

    _, sn = rope_angles(jnp.arange(1000), 64, scaling=("ntk", 4))
    _, su = rope_angles(jnp.arange(1000), 64)
    # highest frequency (pair 0) barely moves; the lowest stretches ~4x
    # (compare sin — at these angles sin ~ angle, cos ~ 1 either way)
    hi = np.abs(np.asarray(sn)[:, 0] - np.asarray(su)[:, 0]).max()
    lo_ratio = (np.abs(np.asarray(su)[-1, -1])
                / max(np.abs(np.asarray(sn)[-1, -1]), 1e-12))
    assert hi < 0.2, hi
    assert lo_ratio > 2.0, lo_ratio

    m = LlamaDecoder(config=QuantConfig(), kv_heads=2, max_len=48,
                     rope_scaling=("linear", 2.0))
    tw = torch_llama(kv_heads=2, max_len=48)
    m.load(tw.state_dict())
    _calibrated(m)
    prompt = _ids(2, 6, seed=31)
    got = m.generate(prompt, 7)
    seq = prompt.copy()
    for s in range(7):
        nxt = m(q.tensor(seq)).numpy()[:, -1].argmax(-1).astype(np.int32)
        np.testing.assert_array_equal(got[:, s], nxt, f"step {s}")
        seq = np.concatenate([seq, nxt[:, None]], axis=1)

    import pytest
    with pytest.raises(ValueError):
        rope_angles(jnp.arange(4), 64, scaling=("cubic", 2))


def test_accuracy_levers_compose_on_llama():
    """The full accuracy stack on the llama family: RMSNorm smoothing ->
    prepare/calibrate -> GPTQ -> convert under per-channel + nearest +
    bias correction — must compose without interference and track the
    model's own FP32 argmax."""
    from int8inferenceengine_tpu import utils
    m, _ = _built(config=QuantConfig(
        weight_per_channel=True, rounding="nearest", bias_correction=True))
    ids_c, ids_t = _ids(8, 64, 41), _ids(16, 32, 42)
    want = m(q.tensor(ids_t)).numpy()
    utils.smooth(m, utils.transformer_smooth_pairs(m), ids_c)
    m.prepare()
    m(q.tensor(ids_c))
    utils.gptq(m, ids_c)
    m.convert()
    got = m(q.tensor(ids_t)).numpy()
    assert np.isfinite(got).all()
    agree = (got[:, -1].argmax(-1) == want[:, -1].argmax(-1)).mean()
    assert agree >= 0.85, agree
