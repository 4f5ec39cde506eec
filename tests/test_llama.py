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
    m, tw = _built()
    _calibrated(m)
    ids = _ids(16, 32, seed=3)
    want = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    got = m(q.tensor(ids)).numpy()
    assert np.isfinite(got).all()
    agree = (got[:, -1].argmax(-1) == want[:, -1].argmax(-1)).mean()
    assert agree >= 0.75, agree


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
