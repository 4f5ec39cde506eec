"""GenerationEngine: continuous-batching decode must be bit-identical to
model.generate() per request — slots are independent batch rows, padded
prefill is exact under the causal mask, and dead cache rows contribute
exactly zero."""

import numpy as np
import pytest

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models
from int8inferenceengine_tpu.serve import GenerationEngine


def _model():
    m = models.build("gpt_tiny")
    m.load(models.torch_twin("gpt_tiny").state_dict())
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 1000, (8, 64)).astype(np.int32)
    m.prepare()
    m(q.tensor(ids))
    m.convert()
    return m


def test_engine_matches_generate():
    """Mixed prompt lengths and max_new, more requests than slots —
    every request's tokens equal a standalone greedy generate()."""
    m = _model()
    eng = GenerationEngine(m, slots=2, chunk_steps=4)
    rng = np.random.default_rng(7)
    reqs = []
    for n, (t0, max_new) in enumerate([(5, 6), (12, 3), (3, 9), (20, 7),
                                       (7, 1)]):
        prompt = rng.integers(0, 1000, t0).astype(np.int32)
        reqs.append((prompt, max_new, eng.submit(prompt, max_new)))
    try:
        for prompt, max_new, fut in reqs:
            got = fut.result(timeout=120)
            want = m.generate(prompt[None, :], max_new)[0]
            np.testing.assert_array_equal(got, want)
            assert got.dtype == np.int32 and got.shape == (max_new,)
    finally:
        eng.shutdown()


def test_engine_eos_stops_early():
    m = _model()
    # pick an eos that the greedy sequence actually emits
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 1000, 6).astype(np.int32)
    full = m.generate(prompt[None, :], 8)[0]
    eos = int(full[3])
    eng = GenerationEngine(m, slots=1, chunk_steps=2, eos_id=eos)
    try:
        got = eng.submit(prompt, 8).result(timeout=120)
        k = int(np.where(full == eos)[0][0])
        np.testing.assert_array_equal(got, full[:k + 1])
    finally:
        eng.shutdown()


def test_engine_guards():
    m = _model()
    eng = GenerationEngine(m, slots=1)
    try:
        try:
            eng.submit([], 4)
            assert False
        except ValueError:
            pass
        try:
            eng.submit(list(range(60)), 10)   # 60 + 10 > max_len 64
            assert False
        except ValueError:
            pass
    finally:
        eng.shutdown()


def test_engine_stats():
    m = _model()
    eng = GenerationEngine(m, slots=2, chunk_steps=4)
    try:
        futs = [eng.submit(np.arange(4 + i, dtype=np.int32) % 1000, 5)
                for i in range(3)]
        for f in futs:
            f.result(timeout=120)
        s = eng.stats
        assert s.requests == 3 and s.prefills == 3
        assert s.tokens == 15
        assert s.chunks >= 1 and 0 < s.mean_slot_fill <= 2.0
        p = s.latency_percentiles()
        assert p["p50"] > 0
    finally:
        eng.shutdown()


def test_submit_after_shutdown_raises():
    m = _model()
    eng = GenerationEngine(m, slots=1)
    eng.shutdown()
    try:
        eng.submit([1, 2, 3], 2)
        assert False, "expected RuntimeError"
    except RuntimeError:
        pass


def test_bucket_never_exceeds_max_len():
    """A prompt whose next power-of-two bucket exceeds max_len must still
    serve (bucket capped), bit-identical to generate()."""
    m = _model()                                  # max_len 64
    eng = GenerationEngine(m, slots=1, chunk_steps=2)
    try:
        prompt = (np.arange(40, dtype=np.int32) * 7) % 1000   # bucket->64
        got = eng.submit(prompt, 4).result(timeout=180)
        want = m.generate(prompt[None, :], 4)[0]
        np.testing.assert_array_equal(got, want)
    finally:
        eng.shutdown()


def test_shutdown_fails_queued_requests():
    """Queued-but-unadmitted requests must fail loudly at shutdown, not
    hang their futures forever."""
    import concurrent.futures
    m = _model()
    eng = GenerationEngine(m, slots=1, chunk_steps=2)
    a = eng.submit(np.arange(5, dtype=np.int32), 30)   # occupies the slot
    b = eng.submit(np.arange(7, dtype=np.int32), 5)    # queued behind it
    eng.shutdown(wait=True)
    assert a.done()
    assert b.done()
    try:
        b.result(timeout=1)
        # either it got admitted before shutdown drained (fine) ...
    except RuntimeError:
        pass                                            # ... or failed loudly


def test_engine_sampling_per_request():
    """submit(temperature=..., seed=...) samples that request while
    greedy requests in other slots stay bit-identical to standalone
    generate(); sampled draws are deterministic in (seed, position)."""
    import numpy as np
    m = _model()
    rng = np.random.default_rng(5)
    p_greedy = rng.integers(0, 1000, 10).astype(np.int32)
    p_sample = rng.integers(0, 1000, 9).astype(np.int32)
    want_greedy = m.generate(p_greedy[None, :], 8)[0]

    eng = GenerationEngine(m, slots=4, chunk_steps=4)
    try:
        f1 = eng.submit(p_greedy, 8)
        f2 = eng.submit(p_sample, 8, temperature=0.9, seed=3)
        f3 = eng.submit(p_sample, 8, temperature=0.9, seed=3)
        f4 = eng.submit(p_sample, 8, temperature=0.9, seed=4)
        g, s1, s2, s3 = (f.result() for f in (f1, f2, f3, f4))
    finally:
        eng.shutdown()
    np.testing.assert_array_equal(g, want_greedy)   # greedy unaffected
    assert ((s1 >= 0) & (s1 < 1000)).all()
    # same seed -> same stream; different seed -> (overwhelmingly) not
    np.testing.assert_array_equal(s1, s2)
    assert not np.array_equal(s1, s3)


def test_engine_overlap_matches_generate():
    """overlap=True (double-buffered chunk pipeline: dispatch chunk k+1
    before fetching chunk k's tokens) must deliver per-request tokens
    bit-identical to standalone generate() — completion detection lags a
    chunk, but lagged/overshoot tokens are dropped against the dispatch
    snapshot, and freed slots re-admit cleanly."""
    m = _model()
    eng = GenerationEngine(m, slots=2, chunk_steps=4, overlap=True)
    rng = np.random.default_rng(11)
    reqs = []
    for t0, max_new in [(5, 6), (12, 3), (3, 9), (20, 7), (7, 1), (4, 12)]:
        prompt = rng.integers(0, 1000, t0).astype(np.int32)
        reqs.append((prompt, max_new, eng.submit(prompt, max_new)))
    try:
        for prompt, max_new, fut in reqs:
            got = fut.result(timeout=120)
            want = m.generate(prompt[None, :], max_new)[0]
            np.testing.assert_array_equal(got, want)
    finally:
        eng.shutdown()


def test_engine_overlap_eos_and_sampling():
    """overlap mode with eos early-stop and a sampled request mixed in:
    greedy requests still match generate(); the sampled slot stays in
    vocabulary range and respects max_new."""
    m = _model()
    rng = np.random.default_rng(13)
    prompt = rng.integers(0, 1000, 6).astype(np.int32)
    full = m.generate(prompt[None, :], 8)[0]
    eos = int(full[3])
    eng = GenerationEngine(m, slots=2, chunk_steps=3, eos_id=eos,
                           overlap=True)
    try:
        f1 = eng.submit(prompt, 8)
        f2 = eng.submit(prompt, 5, temperature=0.9, seed=3)
        got = f1.result(timeout=120)
        k = int(np.where(full == eos)[0][0])
        np.testing.assert_array_equal(got, full[:k + 1])
        s = f2.result(timeout=120)
        assert len(s) <= 5 and ((s >= 0) & (s < 1000)).all()
    finally:
        eng.shutdown()


def test_engine_multichunk_matches_single_sync():
    """sync_chunks > 1 (the in-program multi-chunk while_loop with
    on-device remaining/EOS counting) must emit bit-identical request
    outputs to sync_chunks=1 and to standalone generate(), and must
    actually take FEWER host syncs for long generations (the device
    loop exits early when every slot drains, so chunk counts reflect
    real work)."""
    m = _model()
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, 1000, t0).astype(np.int32)
               for t0 in (5, 9, 14)]
    outs = {}
    for sync in (1, 4):
        eng = GenerationEngine(m, slots=2, chunk_steps=3,
                               sync_chunks=sync)
        try:
            futs = [eng.submit(p, 13) for p in prompts]
            outs[sync] = [f.result(timeout=120) for f in futs]
        finally:
            eng.shutdown()
    for a, b, p in zip(outs[1], outs[4], prompts):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, m.generate(p[None, :], 13)[0])


def test_engine_multichunk_eos_and_sampling():
    m = _model()
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 1000, 6).astype(np.int32)
    full = m.generate(prompt[None, :], 10)[0]
    eos = int(full[4])
    eng = GenerationEngine(m, slots=2, chunk_steps=3, eos_id=eos,
                           sync_chunks=3)
    try:
        got = eng.submit(prompt, 10).result(timeout=120)
        np.testing.assert_array_equal(got, full[:5])
        # sampled request through the multichunk program: deterministic
        # in (seed, position)
        a = eng.submit(prompt, 8, temperature=0.7, seed=3).result(120)
        b_eng = GenerationEngine(m, slots=2, chunk_steps=3,
                                 eos_id=eos, sync_chunks=1)
        try:
            b = b_eng.submit(prompt, 8, temperature=0.7,
                             seed=3).result(120)
        finally:
            b_eng.shutdown()
        np.testing.assert_array_equal(a, b)
    finally:
        eng.shutdown()


def test_engine_chunked_prefill_matches_generate():
    """prefill_chunk: prompts longer than the chunk prefill through ONE
    fixed-size compiled extend program (any length, one compile) —
    outputs must equal standalone generate() exactly; shorter prompts
    still take the bucketed batch path."""
    m = _model()
    eng = GenerationEngine(m, slots=2, chunk_steps=4, prefill_chunk=8)
    rng = np.random.default_rng(21)
    try:
        futs = []
        prompts = [rng.integers(0, 1000, t0).astype(np.int32)
                   for t0 in (20, 17, 5, 24)]        # 3 chunked, 1 bucket
        for p in prompts:
            futs.append(eng.submit(p, 7))
        for p, fut in zip(prompts, futs):
            got = fut.result(timeout=120)
            want = m.generate(p[None, :], 7)[0]
            np.testing.assert_array_equal(got, want)
    finally:
        eng.shutdown()


def test_engine_chunked_prefill_near_max_len():
    """The rounded-up final prefill chunk must not write cache rows
    past max_len (dynamic_update_slice would clamp and corrupt earlier
    rows — round-4 review finding): the last chunk slides back to end
    at max_len, rewriting overlapped rows with identical content."""
    m = _model()                     # max_len = 64 (gpt_tiny default)
    max_len = m.max_len
    P = 6
    t0 = max_len - 3                 # ceil(61/6)*6 = 66 > 64
    assert -(-t0 // P) * P > max_len
    eng = GenerationEngine(m, slots=1, chunk_steps=2, prefill_chunk=P)
    rng = np.random.default_rng(31)
    prompt = rng.integers(0, 1000, t0).astype(np.int32)
    try:
        got = eng.submit(prompt, 3).result(timeout=120)
        want = m.generate(prompt[None, :], 3)[0]
        np.testing.assert_array_equal(got, want)
    finally:
        eng.shutdown()


def test_per_request_eos_and_override():
    """Round 5: eos_id per REQUEST (a traced per-slot vector gates the
    device-side early stop — different stop tokens in one compiled
    program), overriding the engine default.  Uses a sampled request so
    tokens are varied enough to pick a mid-sequence stop."""
    dec = _model()
    rng = np.random.default_rng(31)
    VOCAB = dec.vocab_size
    p = rng.integers(0, VOCAB, (5,)).astype(np.int32)
    eng = GenerationEngine(dec, slots=2, chunk_steps=4)
    try:
        ref = eng.submit(p, 12, temperature=1.0, seed=3).result()
        # find a token that appears mid-sequence and not earlier
        stop_at = next(j for j in range(2, 10)
                       if int(ref[j]) not in ref[:j].tolist())
        e = int(ref[stop_at])
        out = eng.submit(p, 12, temperature=1.0, seed=3,
                         eos_id=e).result()
        assert out.shape == (stop_at + 1,)
        assert (out == ref[:stop_at + 1]).all()
        # a concurrent request with a DIFFERENT eos and one with none
        f1 = eng.submit(p, 12, temperature=1.0, seed=3, eos_id=e)
        f2 = eng.submit(p, 12, temperature=1.0, seed=3)
        a, b = f1.result(), f2.result()
        assert a.shape == (stop_at + 1,) and b.shape == (12,)
        assert (b == ref).all()
    finally:
        eng.shutdown()
    # engine-level default + per-request override
    eng2 = GenerationEngine(dec, slots=2, chunk_steps=4, eos_id=e)
    try:
        c = eng2.submit(p, 12, temperature=1.0, seed=3).result()
        assert c.shape == (stop_at + 1,)
        d = eng2.submit(p, 12, temperature=1.0, seed=3,
                        eos_id=VOCAB + 5).result()   # never fires
        assert d.shape == (12,) and (d == ref).all()
    finally:
        eng2.shutdown()


def test_submit_stream_yields_all_tokens_in_order():
    dec = _model()
    rng = np.random.default_rng(32)
    VOCAB = dec.vocab_size
    p = rng.integers(0, VOCAB, (6,)).astype(np.int32)
    eng = GenerationEngine(dec, slots=2, chunk_steps=4, sync_chunks=2)
    try:
        ref = dec.generate(p[None], 13)[0]
        got = []
        for t in eng.submit_stream(p, 13):
            got.append(t)
        assert len(got) == 13
        assert (np.asarray(got) == ref).all()
        # streaming + eos: ends exactly at the stop token
        sref = eng.submit(p, 13, temperature=1.0, seed=8).result()
        stop_at = next(j for j in range(2, 10)
                       if int(sref[j]) not in sref[:j].tolist())
        got2 = list(eng.submit_stream(p, 13, temperature=1.0, seed=8,
                                      eos_id=int(sref[stop_at])))
        assert len(got2) == stop_at + 1
        assert (np.asarray(got2) == sref[:stop_at + 1]).all()
        # a streaming and a future request interleave fine
        it = eng.submit_stream(p, 9)
        fut = eng.submit(p, 9)
        s_toks = list(it)
        assert (np.asarray(s_toks) == fut.result()).all()
    finally:
        eng.shutdown()


def test_submit_stream_surfaces_shutdown():
    dec = _model()
    eng = GenerationEngine(dec, slots=2, chunk_steps=4)
    eng.shutdown()
    with pytest.raises(RuntimeError):
        eng.submit_stream([1, 2, 3], 4)


def test_dead_engine_refuses_new_submissions():
    """Round-5 review finding: after a loop-fatal error the engine used
    to keep accepting submissions whose futures never resolved.  Now
    the crash handler flips _running off: in-flight futures fail
    loudly, later submits raise immediately."""
    dec = _model()
    eng = GenerationEngine(dec, slots=2, chunk_steps=4)

    def boom(*a, **k):
        raise RuntimeError("injected device failure")

    eng._chunk = boom
    eng._multichunk = boom
    try:
        fut = eng.submit([3, 5, 7], 8)
        with pytest.raises(RuntimeError):
            fut.result(timeout=60)
        with pytest.raises(RuntimeError):
            eng.submit([3, 5, 7], 8)
        with pytest.raises(RuntimeError):
            eng.submit_stream([3, 5, 7], 8)
    finally:
        eng.shutdown(wait=False)


def test_per_request_stop_sequences():
    """Round 5: multi-token stop sequences (host-side suffix match; the
    matched sequence is included, like eos).  Per-request: concurrent
    requests carry different stop lists."""
    dec = _model()
    rng = np.random.default_rng(33)
    p = rng.integers(0, dec.vocab_size, (5,)).astype(np.int32)
    eng = GenerationEngine(dec, slots=2, chunk_steps=4)
    try:
        ref = eng.submit(p, 14, temperature=1.0, seed=4).result()
        # pick a 2-token subsequence ending mid-stream whose FIRST
        # occurrence is at that position
        for j in range(1, 11):
            sq = (int(ref[j]), int(ref[j + 1]))
            hits = [i for i in range(1, 13)
                    if (int(ref[i]), int(ref[i + 1])) == sq]
            if hits and hits[0] == j:
                break
        out = eng.submit(p, 14, temperature=1.0, seed=4,
                         stop=[list(sq)]).result()
        assert out.shape == (j + 2,)
        assert tuple(out[-2:]) == sq
        assert (out == ref[:j + 2]).all()
        # several stop sequences: the earliest match wins
        out2 = eng.submit(p, 14, temperature=1.0, seed=4,
                          stop=[[dec.vocab_size - 1] * 3,
                                list(sq)]).result()
        assert (out2 == out).all()
        # non-matching stop: full length
        out3 = eng.submit(p, 14, temperature=1.0, seed=4,
                          stop=[[dec.vocab_size - 1] * 2]).result()
        assert out3.shape == (14,) and (out3 == ref).all()
        # streaming ends at the stop match
        got = list(eng.submit_stream(p, 14, temperature=1.0, seed=4,
                                     stop=[list(sq)]))
        assert (np.asarray(got) == out).all()
        with pytest.raises(ValueError):
            eng.submit(p, 4, stop=[[]])
    finally:
        eng.shutdown()
