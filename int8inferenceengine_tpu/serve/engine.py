"""Continuous-batching inference engine.

The reference serves nothing: inference is a synchronous Python for-loop over
pre-loaded batches (reference: AlexNet_cifar10_resize224.ipynb cells 3,5;
SURVEY.md §2.4 "Async / request scheduling: No"). This module is the
TPU-native serving story: callers submit individual requests of any batch
size; a scheduler thread coalesces whatever is queued into one device batch,
pads it to a fixed tile (so XLA never retraces — static shapes), runs the
jitted quantized forward, and scatters results back to per-request futures.

Design points
-------------
* **Static batch tiles.** The device step always sees ``max_batch`` rows;
  shorter coalesced batches are padded. One compile, ever.
* **Continuous batching.** The scheduler drains the queue up to ``max_batch``
  rows per step; under load, requests from different callers share a step.
  A ``batch_timeout_s`` lets a lone request wait briefly for company.
* **Pipelining.** The scheduler dispatches step N+1's host work while the
  device executes step N (JAX dispatch is async; blocking happens in the
  result thread via ``block_until_ready``).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future

import jax
import jax.numpy as jnp
import numpy as np

from ..tensor import Tensor


@dataclasses.dataclass
class EngineStats:
    requests: int = 0
    images: int = 0
    steps: int = 0
    padded_rows: int = 0
    # Completed-request latencies (submit -> result materialized), seconds.
    # Bounded ring so a long-lived engine doesn't grow without limit; the
    # lock covers the trim+append vs snapshot race (collector thread writes,
    # any monitoring thread may read).
    latencies_s: list = dataclasses.field(default_factory=list)
    _max_latencies: int = 10_000
    _lat_lock: threading.Lock = dataclasses.field(
        default_factory=threading.Lock, repr=False, compare=False)

    @property
    def mean_batch_fill(self) -> float:
        total = self.images + self.padded_rows
        return self.images / total if total else 0.0

    def record_latency(self, dt: float) -> None:
        with self._lat_lock:
            if len(self.latencies_s) >= self._max_latencies:
                del self.latencies_s[: self._max_latencies // 2]
            self.latencies_s.append(dt)

    def latency_percentiles(self, ps=(50, 90, 99)) -> dict:
        """Request-latency percentiles in milliseconds, e.g. {'p50': 1.2}."""
        with self._lat_lock:
            snap = list(self.latencies_s)
        if not snap:
            return {f"p{p}": float("nan") for p in ps}
        arr = np.asarray(snap)
        return {f"p{p}": float(np.percentile(arr, p) * 1e3) for p in ps}


class _Request:
    __slots__ = ("data", "future", "n", "t_submit")

    def __init__(self, data: np.ndarray):
        self.data = data
        self.n = data.shape[0]
        self.future: Future = Future()
        self.t_submit = time.monotonic()


class InferenceEngine:
    """Continuous-batching server around a (typically converted) Module.

    >>> engine = InferenceEngine(model, max_batch=256)
    >>> fut = engine.submit(images)           # [n, C, H, W] float32, any n
    >>> logits = fut.result()                 # [n, num_classes]
    """

    def __init__(self, model, max_batch: int = 256,
                 batch_timeout_s: float = 0.002, max_inflight: int = 2,
                 quantize_ingest: bool = False, batch_sizes=None):
        """``quantize_ingest=True`` (converted models only) quantizes each
        coalesced batch on the host at the model's input (scale, zp) and —
        when the model's first conv qualifies — applies the space-to-depth
        pre-layout (native/hostops.cc), so the host->device transfer ships
        u8 at 1/4 the bytes and the device program starts at the stride-1
        conv.  Numerically identical to the float path (the same quantize
        runs on device otherwise).

        ``batch_sizes``: optional ascending tile buckets, e.g. ``(32, 256)``.
        Each step pads only up to the smallest tile that fits the coalesced
        rows — small requests at low load stop paying for the full
        ``max_batch`` tile.  One compile per tile (XLA shapes stay static);
        the largest tile caps request size.  Default: one ``max_batch``
        tile, the original behavior."""
        if batch_sizes:
            self.tiles = tuple(sorted(int(b) for b in set(batch_sizes)))
            max_batch = self.tiles[-1]
        else:
            self.tiles = (int(max_batch),)
        self.model = model
        self.max_batch = int(max_batch)
        self.batch_timeout_s = float(batch_timeout_s)
        self.quantize_ingest = bool(quantize_ingest)
        self._ingest_desc = None
        if self.quantize_ingest:
            if not getattr(model, "is_quant", False):
                raise ValueError(
                    "quantize_ingest requires a converted (INT8) model")
            self._ingest_desc = model.ingest_descriptor()
        self.stats = EngineStats()
        self._queue: queue.Queue[_Request | None] = queue.Queue()
        self._pending: _Request | None = None  # overflow carry between steps
        self._stopping = False  # shutdown sentinel seen; flush then exit
        # Dispatched-but-unmaterialized steps; bounded so the scheduler can
        # batch ahead of the device without running away.
        self._done: queue.Queue = queue.Queue(maxsize=max_inflight)
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._collector = threading.Thread(target=self._collect, daemon=True)
        self._thread.start()
        self._collector.start()

    # -- client API ----------------------------------------------------------
    def submit(self, x) -> Future:
        """Enqueue a request batch [n, ...]; returns a Future of np.ndarray."""
        if not self._running:
            raise RuntimeError("engine is shut down")
        arr = np.asarray(x, dtype=np.float32)
        if arr.shape[0] > self.max_batch:
            raise ValueError(
                f"request batch {arr.shape[0]} > max_batch {self.max_batch}; "
                "split the request")
        req = _Request(arr)
        self.stats.requests += 1
        self._queue.put(req)
        return req.future

    def infer(self, x) -> np.ndarray:
        """Synchronous convenience wrapper."""
        return self.submit(x).result()

    def shutdown(self, wait: bool = True) -> None:
        self._running = False
        self._queue.put(None)
        if wait:
            self._thread.join()
            self._done.put(None)
            self._collector.join()
        else:
            self._done.put(None)

    # -- scheduler -----------------------------------------------------------
    def _take_batch(self) -> list[_Request] | None:
        """Collect up to max_batch rows; None on shutdown."""
        if self._stopping and self._pending is None and self._queue.empty():
            return None
        reqs: list[_Request] = []
        rows = 0
        if self._pending is not None:
            reqs.append(self._pending)
            rows = self._pending.n
            self._pending = None
        deadline = None
        while True:
            timeout = None
            if reqs or self._stopping:
                if deadline is None:
                    deadline = time.monotonic() + self.batch_timeout_s
                timeout = max(0.0, deadline - time.monotonic())
            try:
                req = self._queue.get(timeout=timeout)
            except queue.Empty:
                return reqs if reqs else (None if self._stopping else [])
            if req is None:
                # Shutdown sentinel: remember it (there may be coalesced
                # requests to flush first) and drain what's left.
                self._stopping = True
                return reqs if reqs else None
            if rows + req.n > self.max_batch:
                self._pending = req
                return reqs
            reqs.append(req)
            rows += req.n

    def _loop(self) -> None:
        """Scheduler: coalesce -> pad -> dispatch.  Materialization happens
        in the collector thread, so the next batch is being assembled and
        dispatched while the device executes the current one."""
        try:
            while True:
                reqs = self._take_batch()
                if reqs is None:
                    return
                if not reqs:
                    continue
                try:
                    self._dispatch(reqs)
                except Exception as e:  # propagate to all waiters
                    for r in reqs:
                        self._resolve(r, exc=e)
        finally:
            # a submit() racing shutdown() can enqueue after the sentinel;
            # fail anything left so no future hangs forever
            while True:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                if req is not None:
                    self._resolve(req, exc=RuntimeError(
                        "engine shut down before this request was "
                        "scheduled"))

    def _dispatch(self, reqs: list[_Request]) -> None:
        reqs = [r for r in reqs if not r.future.cancelled()]
        if not reqs:
            return
        rows = sum(r.n for r in reqs)
        batch = np.concatenate([r.data for r in reqs], axis=0)
        tile = next(t for t in self.tiles if t >= rows)
        pad = tile - rows
        if pad:
            batch = np.concatenate(
                [batch, np.zeros((pad,) + batch.shape[1:], np.float32)])
        if self.quantize_ingest:
            from .. import native
            from ..data import wrap_quantized
            cfg = self.model.config
            qb = native.quantize_u8(batch, cfg.input_scale,
                                    cfg.input_zero_point)
            t = wrap_quantized(qb, cfg.input_scale, cfg.input_zero_point,
                               self._ingest_desc)
        else:
            t = Tensor(jnp.asarray(batch))
        out = self.model(t)  # async dispatch
        self.stats.steps += 1
        self.stats.images += rows
        self.stats.padded_rows += pad
        self._done.put((reqs, out))   # bounded: applies backpressure

    @staticmethod
    def _resolve(req: _Request, result=None, exc=None) -> bool:
        """Set a request's outcome; a caller may have cancel()ed the future
        (allowed any time before set_result since we never mark it running),
        and set_result on a cancelled future raises InvalidStateError —
        which must not kill the collector thread."""
        try:
            if exc is not None:
                if not req.future.done():
                    req.future.set_exception(exc)
                    return True
            elif not req.future.cancelled():
                req.future.set_result(result)
                return True
        except Exception:   # lost the cancel race; result is dropped
            pass
        return False

    def _collect(self) -> None:
        while True:
            item = self._done.get()
            if item is None:
                return
            reqs, out = item
            try:
                result = out.numpy()   # blocks on the device
            except Exception as e:
                for r in reqs:
                    self._resolve(r, exc=e)
                continue
            off = 0
            t_done = time.monotonic()
            for r in reqs:
                if self._resolve(r, result=result[off:off + r.n]):
                    self.stats.record_latency(t_done - r.t_submit)
                off += r.n
