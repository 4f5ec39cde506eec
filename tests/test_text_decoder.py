"""TextDecoder (gpt_tiny): causal INT8 LM + u8 KV-cache decoding.

The decisive property: cached greedy decoding must be BIT-IDENTICAL to
re-running the full causal INT8 forward at every step — masked positions
quantize to exactly the zero_point code, so unwritten cache rows
contribute exactly zero through the integer zero-point math."""

import numpy as np
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models


def _built(config=None):
    m = models.build("gpt_tiny", config=config or QuantConfig())
    tw = models.torch_twin("gpt_tiny")
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
    """generate() (prefill + u8 KV cache scan) == greedy recompute with the
    full causal forward, token for token."""
    m, _ = _built()
    _calibrated(m)
    b, t0, steps = 3, 7, 9
    prompt = _ids(b, t0, seed=5)
    got = m.generate(prompt, steps)
    assert got.shape == (b, steps)

    seq = prompt.copy()
    for s in range(steps):
        logits = m(q.tensor(seq)).numpy()          # full forward, length T
        nxt = logits[:, -1].argmax(-1).astype(np.int32)
        np.testing.assert_array_equal(got[:, s], nxt, f"step {s}")
        seq = np.concatenate([seq, nxt[:, None]], axis=1)


def test_generate_guards():
    m, _ = _built()
    try:
        m.generate(_ids(2, 4), 3)
        assert False, "expected RuntimeError before convert()"
    except RuntimeError:
        pass
    _calibrated(m)
    try:
        m.generate(_ids(2, 60), 10)     # 60 + 10 > max_len 64
        assert False, "expected ValueError past max_len"
    except ValueError:
        pass


def test_cache_is_uint8():
    """The KV cache holds u8 codes (4x smaller than an f32 cache)."""
    import jax.numpy as jnp
    from int8inferenceengine_tpu.tensor import Tensor
    m, _ = _built()
    _calibrated(m)
    ids = _ids(2, 5, seed=7)
    m._bind(m._gather_params())
    try:
        _, cache = m._prefill(Tensor(jnp.asarray(ids, jnp.float32)))
    finally:
        m._bind(None)
    for i, (k, v) in cache.items():
        assert k.dtype == jnp.uint8 and v.dtype == jnp.uint8
        # T-major FLAT cache rows (ops/attention.py flat decode path)
        assert k.shape == (2, m.max_len, m.dim)


def test_sampling_modes():
    """top_k=1 picks a max-code token (ties on the 8-bit grid are sampled
    uniformly, so it may differ from argmax's first-tie); sampling is
    seed-deterministic; every sampled token stays within the top_k set."""
    m, _ = _built()
    _calibrated(m)
    prompt = _ids(2, 6, seed=9)
    s1 = m.generate(prompt, 5, temperature=1.5, top_k=8, seed=3)
    s2 = m.generate(prompt, 5, temperature=1.5, top_k=8, seed=3)
    np.testing.assert_array_equal(s1, s2)
    s3 = m.generate(prompt, 5, temperature=1.5, top_k=8, seed=4)
    assert not np.array_equal(s1, s3)  # different seed, different draw

    # validity: each sampled token's logit is >= the 8th-highest logit of
    # that step (recomputed with the full causal forward)
    topk1 = m.generate(prompt, 5, temperature=0.8, top_k=1)
    for sample, k in ((s1, 8), (topk1, 1)):
        seq = prompt.copy()
        for step in range(sample.shape[1]):
            logits = m(q.tensor(seq)).numpy()[:, -1]
            kth = np.sort(logits, -1)[:, -k]
            chosen = logits[np.arange(len(seq)), sample[:, step]]
            assert (chosen >= kth).all(), (step, k)
            seq = np.concatenate([seq, sample[:, step:step + 1]], axis=1)
