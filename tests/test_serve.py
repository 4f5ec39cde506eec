"""Continuous-batching engine tests: correctness under coalescing/padding."""

import threading

import numpy as np

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models
from int8inferenceengine_tpu.serve import InferenceEngine


def _rand(shape):
    return np.random.uniform(-1, 1, size=shape).astype(np.float32)


def _calibrated(name="lenet", batch=16):
    tm = models.torch_twin(name)
    mm = models.build(name)
    mm.load(tm.state_dict())
    shape = (batch,) + mm.INPUT_SHAPE
    mm.prepare()
    mm(q.tensor(_rand(shape)))
    mm.convert()
    return mm


def test_results_match_direct_model():
    mm = _calibrated()
    x = _rand((32, 1, 28, 28))
    direct = mm(q.tensor(np.concatenate(
        [x, np.zeros((32, 1, 28, 28), np.float32)]))).numpy()[:32]
    engine = InferenceEngine(mm, max_batch=64, batch_timeout_s=0.01)
    try:
        out = engine.infer(x)
        np.testing.assert_array_equal(out, direct)
    finally:
        engine.shutdown()


def test_concurrent_requests_coalesce_and_scatter_correctly():
    mm = _calibrated()
    engine = InferenceEngine(mm, max_batch=64, batch_timeout_s=0.02)
    try:
        xs = [_rand((n, 1, 28, 28)) for n in (1, 3, 7, 16, 5, 2, 30)]
        futs = [engine.submit(x) for x in xs]
        outs = [f.result(timeout=60) for f in futs]
        for x, out in zip(xs, outs):
            assert out.shape == (x.shape[0], 10)
            # Each request's rows must equal a solo padded run (padding rows
            # can't leak across requests).
            solo = InferenceEngine(mm, max_batch=64)
            try:
                np.testing.assert_array_equal(out, solo.infer(x))
            finally:
                solo.shutdown()
        assert engine.stats.requests == len(xs)
        assert engine.stats.images == sum(x.shape[0] for x in xs)
        assert engine.stats.steps <= len(xs)  # at least some coalescing
    finally:
        engine.shutdown()


def test_many_threads_hammering():
    mm = _calibrated()
    engine = InferenceEngine(mm, max_batch=32, batch_timeout_s=0.001)
    errors = []

    def worker(seed):
        rng = np.random.default_rng(seed)
        for _ in range(5):
            n = int(rng.integers(1, 9))
            x = rng.uniform(-1, 1, (n, 1, 28, 28)).astype(np.float32)
            out = engine.infer(x)
            if out.shape != (n, 10) or not np.isfinite(out).all():
                errors.append((seed, out.shape))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert engine.stats.requests == 8 * 5
    finally:
        engine.shutdown()


def test_oversized_request_rejected():
    mm = _calibrated()
    engine = InferenceEngine(mm, max_batch=8)
    try:
        import pytest
        with pytest.raises(ValueError, match="max_batch"):
            engine.submit(_rand((9, 1, 28, 28)))
    finally:
        engine.shutdown()


def test_shutdown_rejects_new_work():
    mm = _calibrated()
    engine = InferenceEngine(mm, max_batch=8)
    engine.shutdown()
    import pytest
    with pytest.raises(RuntimeError, match="shut down"):
        engine.submit(_rand((1, 1, 28, 28)))


def test_engine_over_sharded_model():
    """Continuous batching in front of a mesh-sharded quantized model."""
    from int8inferenceengine_tpu.parallel.mesh import make_mesh
    mm = _calibrated()
    x = _rand((8, 1, 28, 28))
    base = None
    engine = InferenceEngine(mm, max_batch=16)
    try:
        base = engine.infer(x)
    finally:
        engine.shutdown()
    mm.shard(make_mesh((2, 4)))
    engine = InferenceEngine(mm, max_batch=16)
    try:
        np.testing.assert_array_equal(engine.infer(x), base)
    finally:
        engine.shutdown()


def test_shutdown_flushes_pending_requests():
    """A shutdown racing with queued requests must still answer them all
    (regression: the sentinel used to be dropped while coalescing, leaving
    the scheduler blocked forever and shutdown(wait=True) deadlocked)."""
    mm = _calibrated()
    # Long timeout so requests are still being coalesced when shutdown lands.
    engine = InferenceEngine(mm, max_batch=64, batch_timeout_s=0.5)
    futs = [engine.submit(_rand((2, 1, 28, 28))) for _ in range(5)]
    t = threading.Thread(target=engine.shutdown)
    t.start()
    for f in futs:
        out = f.result(timeout=60)
        assert out.shape == (2, 10)
    t.join(timeout=60)
    assert not t.is_alive(), "shutdown deadlocked"
