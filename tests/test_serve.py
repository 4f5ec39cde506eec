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


def test_quantized_ingest_matches_float_path():
    """quantize_ingest=True must produce the exact same results (the same
    quantize just runs on host), including with the s2d pre-layout."""
    mm = _calibrated()
    x = _rand((8, 1, 28, 28))
    ref = InferenceEngine(mm, max_batch=8)
    try:
        base = ref.infer(x)
    finally:
        ref.shutdown()
    engine = InferenceEngine(mm, max_batch=8, quantize_ingest=True)
    try:
        np.testing.assert_array_equal(engine.infer(x), base)
    finally:
        engine.shutdown()

    # Strided-first-conv model: the engine applies the host s2d pre-layout.
    class Net(q.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = q.Conv2d(3, 16, 5, stride=2, padding=2)
            self.fc = q.Linear(16 * 8 * 8, 10)

        def forward(self, t):
            t = q.relu(self.conv1(t))
            return self.fc(t.reshape(-1, 16 * 8 * 8))

    rng = np.random.default_rng(11)
    m = Net()
    m.conv1.load_weight(rng.normal(0, 0.2, (16, 3, 5, 5)).astype(np.float32))
    m.conv1.load_bias(rng.normal(0, 0.1, (16,)).astype(np.float32))
    m.fc.load_weight(rng.normal(0, 0.05, (10, 1024)).astype(np.float32))
    m.fc.load_bias(rng.normal(0, 0.05, (10,)).astype(np.float32))
    m.prepare()
    m(q.tensor(_rand((8, 3, 16, 16))))
    m.convert()
    xs = _rand((8, 3, 16, 16))
    ref = InferenceEngine(m, max_batch=8)
    try:
        base = ref.infer(xs)
    finally:
        ref.shutdown()
    engine = InferenceEngine(m, max_batch=8, quantize_ingest=True)
    try:
        assert engine._ingest_desc == ("s2d", 5, 2, 2, 3)
        np.testing.assert_array_equal(engine.infer(xs), base)
    finally:
        engine.shutdown()


def test_quantized_ingest_requires_converted_model():
    import pytest
    mm = models.build("lenet")
    with pytest.raises(ValueError, match="converted"):
        InferenceEngine(mm, quantize_ingest=True)


def test_latency_stats_populated():
    mm = _calibrated()
    engine = InferenceEngine(mm, max_batch=16)
    try:
        for _ in range(5):
            engine.infer(_rand((4, 1, 28, 28)))
    finally:
        engine.shutdown()
    assert len(engine.stats.latencies_s) == 5
    pct = engine.stats.latency_percentiles()
    assert pct["p50"] > 0 and pct["p99"] >= pct["p50"]


def test_cancelled_future_does_not_kill_engine():
    """A caller cancel()ing its Future must not crash scheduler/collector
    threads or block later requests."""
    mm = _calibrated()
    engine = InferenceEngine(mm, max_batch=16, batch_timeout_s=0.1)
    try:
        fut = engine.submit(_rand((4, 1, 28, 28)))
        fut.cancel()
        # Engine must still serve subsequent work on the same threads.
        for _ in range(3):
            out = engine.infer(_rand((4, 1, 28, 28)))
            assert out.shape == (4, 10)
    finally:
        engine.shutdown()


def test_batch_size_buckets():
    """Tile bucketing: small coalesced batches pad to the small tile, big
    ones to the big tile; results identical either way."""
    mm = _calibrated()
    x = _rand((4, 1, 28, 28))
    ref = InferenceEngine(mm, max_batch=64)
    try:
        base = ref.infer(x)
    finally:
        ref.shutdown()
    engine = InferenceEngine(mm, batch_sizes=(8, 64), batch_timeout_s=0.01)
    try:
        assert engine.max_batch == 64
        np.testing.assert_array_equal(engine.infer(x), base)
        # 4 rows -> 8-tile (4 padded), not 64
        assert engine.stats.padded_rows == 4
        big = _rand((40, 1, 28, 28))
        out = engine.infer(big)
        assert out.shape == (40, 10)
        assert engine.stats.padded_rows == 4 + 24   # 40 -> 64-tile
    finally:
        engine.shutdown()


def test_bad_request_fails_future_not_engine():
    """A request that breaks the model (wrong input shape) must deliver its
    exception through the Future and leave the engine serving."""
    mm = _calibrated()
    engine = InferenceEngine(mm, max_batch=16, batch_timeout_s=0.01)
    try:
        bad = engine.submit(_rand((2, 3, 28, 28)))   # wrong channel count
        with np.testing.assert_raises(Exception):
            bad.result(timeout=60)
        out = engine.infer(_rand((4, 1, 28, 28)))    # engine still alive
        assert out.shape == (4, 10)
    finally:
        engine.shutdown()


def test_inference_engine_serves_sharded_model():
    """The CNN engine composes with shard() for free: coalesced tiles
    are powers of two (divisible by the data axis), and model(tensor)
    dispatches the shard_map forward — outputs must be bit-identical
    to the unsharded forward (round-5 companion to the sharded
    GenerationEngine)."""
    import jax
    from int8inferenceengine_tpu.parallel import make_mesh
    from __graft_entry__ import _calibrated as _cal
    m = _cal(models.build("lenet"), models.LeNet.INPUT_SHAPE)
    x = np.random.default_rng(0).uniform(
        -1, 1, (20, 1, 28, 28)).astype(np.float32)
    want = np.asarray(m(q.tensor(x)).data)
    m.shard(make_mesh((4, 2), devices=jax.devices()[:8]))
    eng = InferenceEngine(m, max_batch=32)
    try:
        got = eng.submit(x).result()
    finally:
        eng.shutdown()
    assert np.array_equal(got, want)
