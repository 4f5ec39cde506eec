"""Ring KV cache for sliding-window layers (llama / gemma families).

Windowed attention never reads more than W positions back, so with
``ring_cache=True`` a windowed layer allocates roundup32(2W) cache rows
instead of max_len and slides by COMPACTION: when the R rows fill, one
contiguous W-row block copy moves the live window to the front (row r
holds absolute position base + r; base is closed-form in pos).  Reads
stay contiguous, so the flat decode kernel and the composed path run
unchanged — and because compaction copies exactly the rows windowed
attention reads, generation is BIT-IDENTICAL to the full-length cache.
"""
import numpy as np
import pytest

from int8inferenceengine_tpu import models, tensor
from int8inferenceengine_tpu.config import QuantConfig
from int8inferenceengine_tpu.serve import GenerationEngine

from __graft_entry__ import _load_random_weights


def _build(fam, ring, **kw):
    rng = np.random.default_rng(0)
    d = models.build(fam, vocab_size=97, max_len=96, dim=64, depth=2,
                     heads=4, sliding_window=8, ring_cache=ring,
                     config=QuantConfig(rounding="nearest"), **kw)
    _load_random_weights(d)
    d.prepare()
    d(tensor(rng.integers(0, 97, (2, 8)).astype(np.int32)))
    d.convert()
    return d


def test_ring_rows_shrink():
    d = _build("llama_tiny", True)
    assert d._cache_rows(1) == 32 and d._cache_rows(2) == 32
    g = _build("gemma_tiny", True)
    # gemma interleaves: odd blocks windowed (ring), even global (full)
    assert g._cache_rows(1) == 32 and g._cache_rows(2) == 96


def test_ring_bit_identical_across_wraps():
    a, b = _build("llama_tiny", False), _build("llama_tiny", True)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 97, (2, 6)).astype(np.int32)
    # 70 steps wrap the R=32 ring twice-plus (S = R - W = 24)
    assert (a.generate(ids, 70) == b.generate(ids, 70)).all()


def test_ring_long_prompt_prefill_tail():
    """Prompt longer than R: prefill keeps only the tail rows decode's
    steady-state base formula expects."""
    a, b = _build("llama_tiny", False), _build("llama_tiny", True)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 97, (2, 50)).astype(np.int32)
    assert (a.generate(ids, 40) == b.generate(ids, 40)).all()


def test_ring_gemma_mixed_local_global():
    a, b = _build("gemma_tiny", False), _build("gemma_tiny", True)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 97, (2, 6)).astype(np.int32)
    assert (a.generate(ids, 70) == b.generate(ids, 70)).all()


def test_ring_sampling_rides():
    a, b = _build("llama_tiny", False), _build("llama_tiny", True)
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 97, (2, 6)).astype(np.int32)
    kw = dict(temperature=1.0, top_p=0.8, seed=2)
    assert (a.generate(ids, 40, **kw) == b.generate(ids, 40, **kw)).all()


def test_ring_engine_ring_slot_caches():
    """Round-5 VERDICT #4: the serving engine allocates RING-sized slot
    caches for a ring_cache model (roundup32(2W) rows, the O(W) memory
    point where many slots make cache HBM matter) and serves
    bit-identically to generate() — per-slot compaction schedules via
    the vmapped select, per-row ring-tail prefill for padded prompts."""
    b = _build("llama_tiny", True)
    eng = GenerationEngine(b, slots=4, chunk_steps=4, sync_chunks=2)
    try:
        assert eng._ring_serving
        for i in (1, 2):
            assert eng._caches[i][0].shape[1] == 32   # ring rows
        rng = np.random.default_rng(9)
        # mixed lengths: within ring rows, AND a prompt LONGER than the
        # ring (40 > 32: per-row tail slicing in _prefill), staggered
        # admissions so slots compact on different schedules
        prompts = [np.asarray([3, 5, 7], np.int32),
                   rng.integers(0, 97, (17,)).astype(np.int32),
                   rng.integers(0, 97, (40,)).astype(np.int32),
                   rng.integers(0, 97, (9,)).astype(np.int32)]
        outs = [f.result() for f in
                [eng.submit(p, 40) for p in prompts]]
        for p, o in zip(prompts, outs):
            g = b.generate(p[None], 40)[0]
            assert (o == g).all()
    finally:
        eng.shutdown()


def test_ring_engine_gemma_interleave():
    """gemma's local/global interleave: odd layers ring (32 rows), even
    layers full (96) — one engine, per-layer cache shapes."""
    g = _build("gemma_tiny", True, kv_heads=2)
    eng = GenerationEngine(g, slots=2, chunk_steps=4)
    try:
        assert eng._caches[1][0].shape[1] == 32
        assert eng._caches[2][0].shape[1] == 96
        rng = np.random.default_rng(10)
        p = rng.integers(0, 97, (11,)).astype(np.int32)
        out = eng.submit(p, 30).result()
        ref = g.generate(p[None], 30)[0]
        assert (out == ref).all()
    finally:
        eng.shutdown()


def test_ring_engine_sampled_and_guard():
    b = _build("llama_tiny", True)
    with pytest.raises(ValueError):     # chunked prefill needs full len
        GenerationEngine(b, slots=2, prefill_chunk=8)
    eng = GenerationEngine(b, slots=2, chunk_steps=4)
    try:
        s = eng.submit([3, 5, 7], 12, temperature=1.0, seed=4,
                       top_p=0.8).result()
        s2 = eng.submit([3, 5, 7], 12, temperature=1.0, seed=4,
                        top_p=0.8).result()
        assert (s == s2).all() and s.shape == (12,)
    finally:
        eng.shutdown()


def test_ring_engine_sharded():
    """Ring slot caches compose with sharded serving: same per-layer
    ring shapes, head-sharded channels, tokens == generate()."""
    import jax
    from int8inferenceengine_tpu.parallel import make_mesh
    b = _build("llama_tiny", True, kv_heads=2)
    rng = np.random.default_rng(11)
    p = rng.integers(0, 97, (7,)).astype(np.int32)
    ref = b.generate(p[None], 30)[0]
    b.shard(make_mesh((2, 2), devices=jax.devices()[:4]))
    eng = GenerationEngine(b, slots=4, chunk_steps=4)
    try:
        out = eng.submit(p, 30).result()
    finally:
        eng.shutdown()
    assert (out == ref).all()


def test_ring_guards():
    with pytest.raises(ValueError):       # needs a window to ring over
        models.build("llama_tiny", vocab_size=97, max_len=96, dim=64,
                     depth=2, heads=4, ring_cache=True)
    a, b = _build("llama_tiny", False), _build("llama_tiny", True)
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 97, (2, 6)).astype(np.int32)
    with pytest.raises(NotImplementedError):   # extends need full caches
        b.generate_speculative(a, ids, 10)


def test_ring_engine_weight_only_full_caches():
    """Round-5 review finding: weight_only + ring_cache used to
    allocate ring-sized float caches whose long-prompt prefill then
    crashed the loop.  The engine now keeps FULL-length caches for
    weight_only ring models, and long prompts serve fine."""
    rng = np.random.default_rng(12)
    d = models.build("llama_tiny", vocab_size=97, max_len=96, dim=64,
                     depth=2, heads=4, sliding_window=8, ring_cache=True,
                     config=QuantConfig(rounding="nearest",
                                        weight_only=True))
    _load_random_weights(d)
    d.convert()
    eng = GenerationEngine(d, slots=2, chunk_steps=4)
    try:
        assert not eng._ring_serving
        assert eng._caches[1][0].shape[2] == 96    # full length
        p = rng.integers(0, 97, (40,)).astype(np.int32)   # > ring rows
        out = eng.submit(p, 8).result(timeout=120)
        g = d.generate(p[None], 8)[0]
        assert (out == g).all()
    finally:
        eng.shutdown()
