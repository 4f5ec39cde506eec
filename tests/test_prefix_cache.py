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


def test_prefix_table_cap_and_unregister():
    """The prefix table is bounded (each entry holds KV rows on
    device): registration past max_prefixes raises, unregister frees a
    slot and makes stale ids fail loudly, and pids are never reused
    (round-4 advisor finding: unbounded growth + racy len()+1 pid
    allocation)."""
    dec = _decoder()
    eng = GenerationEngine(dec, slots=2, chunk_steps=4, prefill_chunk=8,
                           max_prefixes=2)
    try:
        rng = np.random.default_rng(5)
        p1 = eng.register_prefix(rng.integers(0, 97, (9,)))
        p2 = eng.register_prefix(rng.integers(0, 97, (11,)))
        with pytest.raises(RuntimeError):
            eng.register_prefix(rng.integers(0, 97, (5,)))
        eng.unregister_prefix(p1)
        with pytest.raises(ValueError):
            eng.unregister_prefix(p1)          # already gone
        p3 = eng.register_prefix(rng.integers(0, 97, (7,)))
        assert p3 not in (p1, p2)              # monotonic pids, no reuse
        with pytest.raises(ValueError):        # stale id refused at submit
            eng.submit(np.arange(12, dtype=np.int32), 4, prefix_id=p1)
        # surviving prefixes still serve exactly
        pre = eng._prefixes[p2][0]
        suf = rng.integers(0, 97, (4,)).astype(np.int32)
        full = np.concatenate([pre, suf])
        a = eng.submit(full, 6, prefix_id=p2).result()
        g = dec.generate(full[None], 6)[0]
        assert (a == g).all()
    finally:
        eng.shutdown()


def test_seed_fn_cache_capped():
    dec = _decoder()
    eng = GenerationEngine(dec, slots=2, chunk_steps=4, prefill_chunk=8,
                           max_prefixes=32)
    try:
        eng._SEED_FN_CAP = 3
        rng = np.random.default_rng(6)
        pids = [eng.register_prefix(rng.integers(0, 97, (n,)))
                for n in (3, 5, 7, 9, 11)]     # 5 distinct lengths
        for pid in pids:
            pre = eng._prefixes[pid][0]
            full = np.concatenate(
                [pre, rng.integers(0, 97, (2,)).astype(np.int32)])
            a = eng.submit(full, 4, prefix_id=pid).result()
            g = dec.generate(full[None], 4)[0]
            assert (a == g).all()              # eviction never breaks math
        assert len(eng._seed_fns) <= 3
    finally:
        eng.shutdown()


def test_prefix_cache_sharded_engine():
    """Prefix caching on a SHARDED engine (round 5, second pass):
    registration runs the scratch extends data-replicated (channel
    shard over the model axis only), seeding writes into the owning
    group's slot block — prefixed tokens bit-identical to cold and to
    sharded generate()."""
    import jax
    from int8inferenceengine_tpu.parallel import make_mesh
    dec = _decoder()
    rng = np.random.default_rng(7)
    prefix = rng.integers(0, 97, (21,)).astype(np.int32)
    dec.shard(make_mesh((2, 2), devices=jax.devices()[:4]))
    eng = GenerationEngine(dec, slots=4, chunk_steps=4, prefill_chunk=8)
    try:
        pid = eng.register_prefix(prefix)
        for n_suf in (1, 5):
            suf = rng.integers(0, 97, (n_suf,)).astype(np.int32)
            full = np.concatenate([prefix, suf])
            a = eng.submit(full, 8, prefix_id=pid).result()
            b = eng.submit(full, 8).result()
            g = dec.generate(np.tile(full[None], (2, 1)), 8)[0]
            assert (a == b).all() and (a == g).all()
        assert eng.stats.prefix_hits == 2
        eng.unregister_prefix(pid)
    finally:
        eng.shutdown()


def test_stale_prefix_fails_only_that_request():
    """Round-5 review finding: a prefix unregistered while a request
    referencing it was queued used to raise BEFORE registration — the
    future hung forever and the raise killed the whole engine loop.
    Now only that request fails; the engine keeps serving."""
    dec = _decoder()
    eng = GenerationEngine(dec, slots=1, chunk_steps=4, prefill_chunk=8)
    try:
        rng = np.random.default_rng(11)
        pre = rng.integers(0, 97, (9,)).astype(np.int32)
        pid = eng.register_prefix(pre)
        full = np.concatenate([pre, rng.integers(0, 97, (3,))
                               .astype(np.int32)])
        # occupy the single slot so the prefixed request queues, then
        # unregister before it is admitted
        blocker = eng.submit(rng.integers(0, 97, (4,)).astype(np.int32),
                             24)
        victim = eng.submit(full, 6, prefix_id=pid)
        eng.unregister_prefix(pid)
        blocker.result()
        with pytest.raises(ValueError):
            victim.result(timeout=60)
        # the engine survived: a fresh request still serves correctly
        nxt = eng.submit(full, 6).result(timeout=60)
        g = dec.generate(full[None], 6)[0]
        assert (nxt == g).all()
    finally:
        eng.shutdown()
