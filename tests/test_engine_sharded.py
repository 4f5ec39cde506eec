"""GenerationEngine over a shard()ed decoder (round-4 VERDICT #1 /
SURVEY hard-part #5: continuous batching over sharded weights).

Design under test (serve/generation.py): every engine device program —
batched bucketed prefill, the decode chunk, the multi-chunk
while_loop, chunked prefill — runs under shard_map on the model's
mesh.  Slots split over the DATA axis (each data-shard group owns
slots/data_size slot rows), attention heads over the MODEL axis (the
same head-sharded u8 KV cache sharded generate() uses: each device
stores 1/model_size of every slot's cache rows), row-parallel
proj/fc2 psum inside the step.  Admission / host sync / completion
logic is unchanged.

Exactness: slots are batch rows and the static-INT8 TP math is
integer-exact (local s32 partials psummed, ONE requant after — the
round-2 bit-exactness argument), so a sharded engine's request tokens
are BIT-identical to sharded generate(), which is itself bit-identical
to unsharded generate().
"""
import numpy as np
import pytest
import jax.numpy as jnp

from int8inferenceengine_tpu import models, tensor
from int8inferenceengine_tpu.config import QuantConfig
from int8inferenceengine_tpu.parallel import make_mesh
from int8inferenceengine_tpu.serve import GenerationEngine

from __graft_entry__ import _load_random_weights


def _mesh(shape):
    import jax
    n = shape[0] * shape[1]
    return make_mesh(shape, devices=jax.devices()[:n])


def _gpt(max_len=48):
    rng = np.random.default_rng(0)
    dec = models.build("gpt_tiny", vocab_size=97, max_len=max_len,
                       dim=64, depth=2, heads=4, config=QuantConfig())
    _load_random_weights(dec)
    dec.prepare()
    dec(tensor(rng.integers(0, 97, (2, 8)).astype(np.int32)))
    dec.convert()
    return dec


def _llama(kv_heads=2, max_len=48):
    rng = np.random.default_rng(1)
    dec = models.build("llama_tiny", vocab_size=97, max_len=max_len,
                       dim=64, depth=2, heads=4, kv_heads=kv_heads,
                       config=QuantConfig())
    _load_random_weights(dec)
    dec.prepare()
    dec(tensor(rng.integers(0, 97, (2, 8)).astype(np.int32)))
    dec.convert()
    return dec


def _oracle(dec, prompt, steps, ds):
    """Sharded generate() needs batch % data_size == 0: replicate the
    prompt over the batch (identical rows emit identical tokens)."""
    return dec.generate(np.tile(prompt[None], (ds, 1)), steps)[0]


@pytest.mark.parametrize("mesh_shape,family", [
    ((4, 2), "gpt"), ((2, 2), "gpt"), ((4, 2), "llama"),
    ((2, 2), "llama")])
def test_engine_matches_sharded_generate(mesh_shape, family):
    """The VERDICT #1 'done' bar: engine tokens bit-identical to
    sharded generate() for gpt and llama(GQA) at (4,2) and (2,2)."""
    dec = _gpt() if family == "gpt" else _llama()
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, 97, (n,)).astype(np.int32)
               for n in (3, 7, 5, 9)]
    g_un = [dec.generate(p[None], 10)[0] for p in prompts]
    dec.shard(_mesh(mesh_shape))
    ds = mesh_shape[0]
    eng = GenerationEngine(dec, slots=4, chunk_steps=4)
    try:
        outs = [f.result() for f in
                [eng.submit(p, 10) for p in prompts]]
    finally:
        eng.shutdown()
    for p, o, u in zip(prompts, outs, g_un):
        g = _oracle(dec, p, 10, ds)
        assert (o == g).all()          # == sharded generate
        assert (o == u).all()          # == unsharded generate


def test_engine_oversubscribed_and_multichunk():
    """More requests than slots + sync_chunks > 1 (the multi-chunk
    while_loop runs when the queue drains; per-data-group early exit
    must not corrupt tokens)."""
    dec = _gpt()
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 97, (3 + (j % 5),)).astype(np.int32)
               for j in range(10)]
    refs = [dec.generate(p[None], 12)[0] for p in prompts]
    dec.shard(_mesh((2, 2)))
    eng = GenerationEngine(dec, slots=4, chunk_steps=4, sync_chunks=3)
    try:
        outs = [f.result() for f in
                [eng.submit(p, 12) for p in prompts]]
        assert eng.stats.requests == 10
        assert eng.stats.chunks > 0
    finally:
        eng.shutdown()
    for o, r in zip(outs, refs):
        assert (o == r).all()


def test_engine_sampled_topp_matches_unsharded_engine():
    """Per-slot sampling (temperature, seed, top_p) is deterministic in
    (seed, position) regardless of which data shard hosts the slot —
    sharded engine draws must equal the unsharded engine's."""
    dec = _gpt()
    rng = np.random.default_rng(4)
    p = rng.integers(0, 97, (5,)).astype(np.int32)
    eng0 = GenerationEngine(dec, slots=4, chunk_steps=4)
    try:
        base_g = eng0.submit(p, 8).result()
        base_s = eng0.submit(p, 8, temperature=1.0, seed=7).result()
        base_t = eng0.submit(p, 8, temperature=1.0, seed=7,
                             top_p=0.6).result()
    finally:
        eng0.shutdown()
    dec.shard(_mesh((2, 2)))
    eng = GenerationEngine(dec, slots=4, chunk_steps=4)
    try:
        g = eng.submit(p, 8).result()
        s = eng.submit(p, 8, temperature=1.0, seed=7).result()
        t = eng.submit(p, 8, temperature=1.0, seed=7,
                       top_p=0.6).result()
    finally:
        eng.shutdown()
    assert (g == base_g).all()
    assert (s == base_s).all()
    assert (t == base_t).all()


def test_engine_chunked_prefill_sharded():
    """Long prompts through the ONE fixed-size extend program, now
    under shard_map (ownership-masked single-slot extend)."""
    dec = _gpt(max_len=64)
    rng = np.random.default_rng(5)
    long_p = rng.integers(0, 97, (21,)).astype(np.int32)
    short_p = rng.integers(0, 97, (4,)).astype(np.int32)
    ref_l = dec.generate(long_p[None], 8)[0]
    ref_s = dec.generate(short_p[None], 8)[0]
    dec.shard(_mesh((2, 2)))
    eng = GenerationEngine(dec, slots=4, chunk_steps=4, prefill_chunk=8)
    try:
        a = eng.submit(long_p, 8).result()
        b = eng.submit(short_p, 8).result()
    finally:
        eng.shutdown()
    assert (a == ref_l).all()
    assert (b == ref_s).all()


def test_engine_mqa_fallback_geometry():
    """kv_heads=1 on a model axis of 2: heads stay replicated (no
    head-local TP), the cache is channel-replicated — the engine must
    detect that and still match generate()."""
    dec = _llama(kv_heads=1)
    rng = np.random.default_rng(6)
    p = rng.integers(0, 97, (6,)).astype(np.int32)
    ref = dec.generate(p[None], 8)[0]
    dec.shard(_mesh((2, 2)))
    eng = GenerationEngine(dec, slots=2, chunk_steps=4)
    try:
        assert eng._kv_sharded is False
        out = eng.submit(p, 8).result()
    finally:
        eng.shutdown()
    assert (out == ref).all()


def test_engine_sharded_guards():
    dec = _gpt()
    dec.shard(_mesh((4, 2)))
    with pytest.raises(ValueError):          # slots must divide data axis
        GenerationEngine(dec, slots=6)
    eng = GenerationEngine(dec, slots=4, prefill_chunk=8)
    try:
        pid = eng.register_prefix([1, 2, 3])   # composes as of round 5
        assert pid >= 1
    finally:
        eng.shutdown()


def test_engine_weight_only_sharded_guard():
    rng = np.random.default_rng(7)
    dec = models.build("gpt_tiny", vocab_size=97, max_len=32, dim=64,
                       depth=1, heads=4,
                       config=QuantConfig(weight_only=True))
    _load_random_weights(dec)
    dec.convert()
    dec.shard(_mesh((2, 2)))
    with pytest.raises(NotImplementedError):
        GenerationEngine(dec, slots=4)
