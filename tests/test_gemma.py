"""GemmaDecoder (gemma-2 family): unit-offset RMSNorms, sandwich
norms, GeGLU, attention + final logit softcapping, alternating
sliding-window attention, decoupled head_dim (models/gemma.py).
"""
import numpy as np
import pytest
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models, utils
from int8inferenceengine_tpu.models.gemma import GemmaDecoder, torch_gemma


def _pair(config=None, **kw):
    geo = dict(vocab_size=211, max_len=48, dim=64, depth=2, heads=4,
               kv_heads=2, sliding_window=8)
    geo.update(kw)
    tw = torch_gemma(**geo)
    m = GemmaDecoder(**geo, config=config or QuantConfig())
    m.load(tw.state_dict())
    ids = np.random.default_rng(0).integers(
        0, geo["vocab_size"], (2, 16)).astype(np.int32)
    return tw, m, ids


def test_fp32_parity_vs_torch():
    """Whole-architecture parity: softcaps, sandwich norms, GeGLU,
    embed scaling, per-layer windows — all in one forward."""
    tw, m, ids = _pair()
    ref = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    got = np.asarray(m(q.tensor(ids)).data)
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_fp32_parity_wide_heads():
    """head_dim decoupled from dim/heads (gemma-2's wide heads)."""
    tw, m, ids = _pair(head_dim=32)          # 4 heads x 32 > dim 64
    ref = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    got = np.asarray(m(q.tensor(ids)).data)
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_int8_tracks_fp32():
    """INT8 with the many-boundary accuracy configuration (nearest —
    gemma's sandwich norms add even more requant boundaries per block
    than llama; the trunc depth-bias story applies a fortiori).  Uses
    the registry geometry (dim 128, vocab 1000): the final softcap
    compresses logit margins, so the tiny test geometry's near-flat
    toy logits flip argmax on quantization noise (the round-1 W4
    lesson) — at this size nearest agreement is clean."""
    tw = models.torch_twin("gemma_tiny")
    m = models.build("gemma_tiny",
                     config=QuantConfig(rounding="nearest"))
    m.load(tw.state_dict())
    ids = np.random.default_rng(0).integers(0, 1000, (4, 16)).astype(
        np.int32)
    ref = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    m.prepare()
    m(q.tensor(ids))
    m.convert()
    codes = np.asarray(m(q.tensor(ids)).data).astype(np.float32)
    agree = (codes[:, -1].argmax(-1) == ref[:, -1].argmax(-1)).mean()
    assert agree >= 0.9, agree


def _converted(**kw):
    _, m, ids = _pair(config=QuantConfig(rounding="nearest"), **kw)
    m.prepare()
    m(q.tensor(ids))
    m.convert()
    return m, ids


def test_cached_decode_equals_recompute():
    """The invariant through every gemma delta at once: windowed odd
    blocks, softcapped scores (kernel tail + composed prefill),
    sandwich norms, GeGLU."""
    m, ids = _converted()
    toks = np.asarray(m.generate(ids, 16))
    longer = np.concatenate([ids, toks[:, :8]], 1)
    t2 = np.asarray(m.generate(longer, 8))
    assert (t2 == toks[:, 8:16]).all()


def test_softcap_changes_scores():
    """A tight attention softcap must change outputs vs a loose one
    (otherwise the cap never engaged and softcap tests are vacuous)."""
    m1, ids = _converted()
    m2, _ = _converted(attn_softcap=0.05)
    a = np.asarray(m1.generate(ids, 16))
    b = np.asarray(m2.generate(ids, 16))
    assert not (a == b).all()


def test_checkpoint_roundtrip(tmp_path):
    m, ids = _converted()
    want = np.asarray(m.generate(ids, 8))
    path = str(tmp_path / "gemma.safetensors")
    utils.save(m, path)
    geo = dict(vocab_size=211, max_len=48, dim=64, depth=2, heads=4,
               kv_heads=2, sliding_window=8)
    fresh = GemmaDecoder(**geo, config=QuantConfig(rounding="nearest"))
    utils.load(fresh, path)
    assert (np.asarray(fresh.generate(ids, 8)) == want).all()


def test_registry_and_engine():
    from __graft_entry__ import _load_random_weights
    from int8inferenceengine_tpu.serve.generation import GenerationEngine
    m = models.build("gemma_tiny", vocab_size=128, max_len=48, dim=64,
                     depth=2, heads=4,
                     config=QuantConfig(rounding="nearest"))
    _load_random_weights(m)
    ids = np.random.default_rng(2).integers(0, 128, (2, 8)).astype(
        np.int32)
    m.prepare()
    m(q.tensor(ids))
    m.convert()
    eng = GenerationEngine(m, slots=2, chunk_steps=4)
    try:
        got = eng.submit(ids[0], 8).result(timeout=300)
        want = np.asarray(m.generate(ids[0:1], 8))[0]
        assert (got == want).all()
    finally:
        eng.shutdown()
