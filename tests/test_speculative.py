"""Speculative decoding (TextDecoder.generate_speculative): one jitted
draft -> verify -> accept loop whose output must equal greedy generate()
token for token — every emitted token is the target's own argmax, and the
T-major flat cache makes rejection rollback a free pointer rewind."""

import numpy as np
import pytest

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models


def _ids(b, t, seed=0, vocab=1000):
    return np.random.default_rng(seed).integers(
        0, vocab, size=(b, t)).astype(np.int32)


def _gpt(max_len=64, dim=128, depth=2, heads=2, seed_cal=1):
    m = models.build("gpt_tiny", max_len=max_len, dim=dim, depth=depth,
                     heads=heads)
    from int8inferenceengine_tpu.models.text_decoder import \
        torch_text_decoder
    m.load(torch_text_decoder(max_len=max_len, dim=dim, depth=depth,
                              heads=heads).state_dict())
    m.prepare(); m(q.tensor(_ids(8, max_len, seed_cal))); m.convert()
    return m


def _llama(max_len=64, seed_cal=2, **kw):
    kw.setdefault("kv_heads", 2)
    m = models.LlamaDecoder(max_len=max_len, config=QuantConfig(), **kw)
    from int8inferenceengine_tpu.models.llama import torch_llama
    m.load(torch_llama(max_len=max_len, **kw).state_dict())
    m.prepare(); m(q.tensor(_ids(8, max_len, seed_cal))); m.convert()
    return m


def test_extend_step_equals_sequential_decode_steps():
    """The cached m-token extend must produce the same logit codes and
    the same cache as m sequential single-token decode steps (the m=1
    invariant, generalized)."""
    import jax.numpy as jnp
    from int8inferenceengine_tpu.tensor import Tensor

    m = _gpt()
    prompt = _ids(3, 9, seed=5)
    toks = _ids(3, 4, seed=6)
    _, cache0 = m._prefill(Tensor(jnp.asarray(prompt, jnp.float32)))

    codes_ext, cache_ext = m._extend_step(cache0, jnp.int32(9),
                                          jnp.asarray(toks))
    cache_seq = cache0
    seq_codes = []
    for j in range(4):
        cj, cache_seq = m._decode_step(cache_seq, jnp.int32(9 + j),
                                       jnp.asarray(toks[:, j]))
        seq_codes.append(np.asarray(cj))
    np.testing.assert_array_equal(np.asarray(codes_ext),
                                  np.stack(seq_codes, axis=1))
    for i in cache_ext:
        np.testing.assert_array_equal(np.asarray(cache_ext[i][0]),
                                      np.asarray(cache_seq[i][0]))
        np.testing.assert_array_equal(np.asarray(cache_ext[i][1]),
                                      np.asarray(cache_seq[i][1]))


@pytest.mark.parametrize("k", [1, 3, 5])
def test_gpt_spec_equals_generate(k):
    target = _gpt(dim=128, depth=2, heads=2)
    draft = _gpt(dim=64, depth=1, heads=2, seed_cal=3)
    prompt = _ids(4, 12, seed=7)
    steps = 14
    want = target.generate(prompt, steps)
    got = target.generate_speculative(draft, prompt, steps, k=k)
    np.testing.assert_array_equal(got, want)


def test_llama_target_gpt_draft():
    """Cross-family speculation: a tiny gpt drafts for a llama target."""
    target = _llama()
    draft = _gpt(dim=64, depth=1, heads=2, seed_cal=4)
    prompt = _ids(3, 10, seed=9)
    want = target.generate(prompt, 12)
    got = target.generate_speculative(draft, prompt, 12, k=3)
    np.testing.assert_array_equal(got, want)


def test_llama_self_speculation_full_acceptance():
    """draft == target accepts every token (d_i == g_i by construction)
    — output still equals generate()."""
    m = _llama()
    prompt = _ids(2, 8, seed=11)
    want = m.generate(prompt, 10)
    got = m.generate_speculative(m, prompt, 10, k=4)
    np.testing.assert_array_equal(got, want)


def test_guards():
    target = _gpt()
    draft = _gpt(dim=64, depth=1, heads=2, seed_cal=3)
    prompt = _ids(2, 8)
    with pytest.raises(ValueError):
        target.generate_speculative(draft, prompt, 60, k=4)  # headroom
    with pytest.raises(ValueError):
        target.generate_speculative(draft, prompt, 0, k=4)
    with pytest.raises(ValueError):
        target.generate_speculative(draft, prompt, 4, k=0)
    fresh = models.build("gpt_tiny")
    with pytest.raises(RuntimeError):
        fresh.generate_speculative(draft, prompt, 4)


def test_sharded_target_spec_equals_sharded_generate():
    """Round-5 VERDICT #6: TP-sharded target + replicated draft — the
    serving-relevant combination.  The whole draft->verify->accept
    while_loop runs under shard_map; spec must equal sharded greedy
    generate() bit-for-bit at a (2,2) mesh (and that equals the
    unsharded run)."""
    import jax
    from int8inferenceengine_tpu.parallel import make_mesh
    target = _llama(heads=4, kv_heads=2, dim=64)
    draft = _gpt(dim=64, depth=1, heads=2, seed_cal=4)
    prompt = _ids(4, 6, seed=21)
    want_un = target.generate(prompt, 12)
    spec_un = target.generate_speculative(draft, prompt, 12, k=3)
    np.testing.assert_array_equal(spec_un, want_un)
    target.shard(make_mesh((2, 2), devices=jax.devices()[:4]))
    want_sh = target.generate(prompt, 12)
    np.testing.assert_array_equal(want_sh, want_un)
    spec_sh = target.generate_speculative(draft, prompt, 12, k=3)
    np.testing.assert_array_equal(spec_sh, want_sh)


def test_sharded_spec_guards():
    import jax
    from int8inferenceengine_tpu.parallel import make_mesh
    target = _llama(heads=4, kv_heads=2, dim=64)
    draft = _gpt(dim=64, depth=1, heads=2, seed_cal=5)
    draft.shard(make_mesh((2, 2), devices=jax.devices()[:4]))
    with pytest.raises(NotImplementedError):   # draft must be replicated
        target.generate_speculative(draft, _ids(2, 6), 8)
    target.shard(make_mesh((2, 2), devices=jax.devices()[:4]))
    draft2 = _gpt(dim=64, depth=1, heads=2, seed_cal=6)
    with pytest.raises(ValueError):            # batch % data_size
        target.generate_speculative(draft2, _ids(3, 6), 8)
