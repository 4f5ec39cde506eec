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


def test_ring_engine_uses_full_caches():
    """The serving engine allocates full-length caches, so a ring-cache
    model serves through it unchanged (both paths are exact, so tokens
    agree)."""
    b = _build("llama_tiny", True)
    eng = GenerationEngine(b, slots=2, chunk_steps=4)
    try:
        out = eng.submit([3, 5, 7], 40).result()
        g = b.generate(np.asarray([[3, 5, 7]], np.int32), 40)[0]
        assert (out == g).all()
    finally:
        eng.shutdown()


def test_ring_guards():
    with pytest.raises(ValueError):       # needs a window to ring over
        models.build("llama_tiny", vocab_size=97, max_len=96, dim=64,
                     depth=2, heads=4, ring_cache=True)
    a, b = _build("llama_tiny", False), _build("llama_tiny", True)
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 97, (2, 6)).astype(np.int32)
    with pytest.raises(NotImplementedError):   # extends need full caches
        b.generate_speculative(a, ids, 10)
