"""Prefix caching: shared-prompt KV reuse in the GenerationEngine.

Exactness story (serve/generation.py register_prefix): on the static
INT8 path cached k/v are u8 codes at fixed calibrated grids and
position t's codes depend only on tokens <= t, so a registered
prefix's rows are context-independent and integer-exact — a prefixed
submission must be BIT-IDENTICAL to submitting the full prompt cold,
and to standalone generate().  Registration and suffix prefill both
ride the one compiled chunked-extend program (no new program shapes).
"""
import numpy as np
import pytest

from int8inferenceengine_tpu import models, tensor
from int8inferenceengine_tpu.config import QuantConfig
from int8inferenceengine_tpu.serve import GenerationEngine

from __graft_entry__ import _load_random_weights


def _decoder(config=None, max_len=64):
    rng = np.random.default_rng(0)
    dec = models.build("gpt_tiny", vocab_size=97, max_len=max_len,
                       dim=64, depth=2, heads=4,
                       config=config or QuantConfig())
    _load_random_weights(dec)
    if not dec.config.weight_only:
        dec.prepare()
        dec(tensor(rng.integers(0, 97, (2, 8)).astype(np.int32)))
    dec.convert()
    return dec


def test_prefix_bit_identical_to_cold_and_generate():
    dec = _decoder()
    eng = GenerationEngine(dec, slots=2, chunk_steps=4, prefill_chunk=8)
    try:
        rng = np.random.default_rng(1)
        prefix = rng.integers(0, 97, (21,)).astype(np.int32)
        pid = eng.register_prefix(prefix)
        for n_suf in (1, 5, 13):        # incl. suffix shorter than P
            suf = rng.integers(0, 97, (n_suf,)).astype(np.int32)
            full = np.concatenate([prefix, suf])
            a = eng.submit(full, 10, prefix_id=pid).result()
            b = eng.submit(full, 10).result()
            g = dec.generate(full[None], 10)[0]
            assert (a == b).all() and (a == g).all()
        assert eng.stats.prefix_hits == 3
    finally:
        eng.shutdown()


def test_prefix_near_max_len_slide_back():
    """Suffix chunk start past max_len - P slides back over prefix
    rows; the overlapped rows rewrite identically (same tokens, same
    positions) so the output stays exact."""
    dec = _decoder(max_len=32)
    eng = GenerationEngine(dec, slots=2, chunk_steps=4, prefill_chunk=8)
    try:
        rng = np.random.default_rng(2)
        prefix = rng.integers(0, 97, (27,)).astype(np.int32)
        pid = eng.register_prefix(prefix)
        full = np.concatenate(
            [prefix, rng.integers(0, 97, (2,)).astype(np.int32)])
        a = eng.submit(full, 3, prefix_id=pid).result()
        g = dec.generate(full[None], 3)[0]
        assert (a == g).all()
    finally:
        eng.shutdown()


def test_prefix_with_sampling_and_topp():
    dec = _decoder()
    eng = GenerationEngine(dec, slots=2, chunk_steps=4, prefill_chunk=8)
    try:
        rng = np.random.default_rng(3)
        prefix = rng.integers(0, 97, (16,)).astype(np.int32)
        pid = eng.register_prefix(prefix)
        full = np.concatenate(
            [prefix, rng.integers(0, 97, (5,)).astype(np.int32)])
        kw = dict(temperature=1.0, seed=4, top_p=0.8)
        a = eng.submit(full, 10, prefix_id=pid, **kw).result()
        b = eng.submit(full, 10, **kw).result()
        assert (a == b).all()
    finally:
        eng.shutdown()


def test_prefix_shared_across_concurrent_slots():
    dec = _decoder()
    eng = GenerationEngine(dec, slots=4, chunk_steps=4, prefill_chunk=8)
    try:
        rng = np.random.default_rng(4)
        prefix = rng.integers(0, 97, (12,)).astype(np.int32)
        pid = eng.register_prefix(prefix)
        sufs = [rng.integers(0, 97, (3 + i,)).astype(np.int32)
                for i in range(6)]     # oversubscribes the 4 slots
        futs = [eng.submit(np.concatenate([prefix, s]), 8,
                           prefix_id=pid) for s in sufs]
        for s, f in zip(sufs, futs):
            g = dec.generate(np.concatenate([prefix, s])[None], 8)[0]
            assert (f.result() == g).all()
    finally:
        eng.shutdown()


def test_prefix_weight_only_path_runs():
    """Float serving: same machinery, float rows.  Bit-identity to the
    cold path is NOT guaranteed by design (program-variant float
    tiling); this pins that the path works and, on this CPU test
    platform, currently reproduces the cold tokens."""
    dec = _decoder(QuantConfig(weight_only=True))
    eng = GenerationEngine(dec, slots=2, chunk_steps=4, prefill_chunk=8)
    try:
        rng = np.random.default_rng(5)
        prefix = rng.integers(0, 97, (16,)).astype(np.int32)
        pid = eng.register_prefix(prefix)
        full = np.concatenate(
            [prefix, rng.integers(0, 97, (4,)).astype(np.int32)])
        a = eng.submit(full, 8, prefix_id=pid).result()
        b = eng.submit(full, 8).result()
        assert a.shape == (8,) and (a == b).all()
    finally:
        eng.shutdown()


def test_prefix_validation():
    dec = _decoder()
    eng = GenerationEngine(dec, slots=2, chunk_steps=4, prefill_chunk=8)
    try:
        rng = np.random.default_rng(6)
        prefix = rng.integers(0, 97, (10,)).astype(np.int32)
        pid = eng.register_prefix(prefix)
        with pytest.raises(ValueError):        # must extend the prefix
            eng.submit(prefix, 4, prefix_id=pid)
        with pytest.raises(ValueError):        # wrong leading tokens
            eng.submit(np.concatenate(
                [(prefix + 1) % 97, prefix[:2]]), 4, prefix_id=pid)
        with pytest.raises(ValueError):
            eng.submit([1, 2, 3], 4, prefix_id=999)
        with pytest.raises(ValueError):
            eng.register_prefix([])
        with pytest.raises(ValueError):        # no room under max_len
            eng.register_prefix(np.zeros(64, np.int32))
    finally:
        eng.shutdown()
    eng2 = GenerationEngine(dec, slots=2)      # no prefill_chunk
    try:
        with pytest.raises(ValueError):
            eng2.register_prefix([1, 2, 3])
    finally:
        eng2.shutdown()
