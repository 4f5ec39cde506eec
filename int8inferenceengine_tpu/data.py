"""Prefetching data loader: host preprocessing overlapped with device compute.

The reference's "data pipeline" is a Python for-loop slicing pre-loaded
torch tensors and copying each batch into the C++ engine synchronously
(reference: AlexNet_cifar10_resize224.ipynb cells 1,3,5; copy at
include/tensor.h:40-47).  Here a background thread preprocesses the next
batches (natively — see native/hostops.cc) and enqueues them to the device
while the TPU executes the current one, so host work and host->HBM transfer
hide behind compute.

Two modes:
* float mode (default): yields f32 NCHW Tensors — feed any model.
* quantized ingest (``quantize_to=(scale, zp)``): preprocess + input
  quantization happen on the host in one native pass, the device receives u8
  (4x fewer bytes over the interconnect), and yields are quantized Tensors
  ready for a converted model's ``forward`` (skip Module input quant by
  calling ``model.forward_quantized`` / using the engine's raw path).
"""

from __future__ import annotations

import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np

from . import native
from .tensor import Tensor

_STOP = object()


def wrap_quantized(q_nchw_u8: np.ndarray, scale, zero_point,
                   ingest=None) -> Tensor:
    """Wrap a host-quantized u8 NCHW batch as a device-ready Tensor,
    applying the first-conv zp-pad + space-to-depth pre-layout when
    ``ingest`` (a Conv2d.ingest_descriptor tag) is set.  The single place
    the host-ingest contract lives — used by the DataLoader and the serving
    engine."""
    if ingest is not None:
        _, k, s, p, _c = ingest
        q_nchw_u8 = native.s2d_quantized(q_nchw_u8, k, s, p, int(zero_point))
    return Tensor(jnp.asarray(q_nchw_u8), float(scale), int(zero_point),
                  _ingest=ingest)


class DataLoader:
    """Iterate device-resident batches of a host array.

    Parameters
    ----------
    images : np.ndarray — either f32 NCHW (ready) or u8 NHWC (raw images,
        requires ``mean``/``std`` for preprocessing).
    batch_size : rows per yielded batch (last partial batch is dropped when
        ``drop_remainder``, else padded is NOT applied — it is yielded short).
    mean, std : per-channel normalization for u8 NHWC input.
    resize_to : optional (H, W) bilinear resize for u8 NHWC input (the
        AlexNet notebook's 32 -> 224 step).
    quantize_to : optional (scale, zero_point) — host-side input quantization.
    prefetch : max batches in flight ahead of the consumer.
    """

    def __init__(self, images, batch_size: int, *, labels=None, mean=None,
                 std=None, resize_to=None, quantize_to=None, prefetch: int = 2,
                 drop_remainder: bool = False, layout_for=None):
        self.images = images
        self.labels = labels
        self.batch_size = int(batch_size)
        self.mean = None if mean is None else np.asarray(mean, np.float32)
        self.std = None if std is None else np.asarray(std, np.float32)
        self.resize_to = resize_to
        self.quantize_to = quantize_to
        self.prefetch = int(prefetch)
        self.drop_remainder = drop_remainder
        if images.dtype == np.uint8 and (self.mean is None or self.std is None):
            raise ValueError("u8 NHWC input requires mean/std")
        if resize_to is not None and images.dtype != np.uint8:
            raise ValueError("resize_to only applies to u8 NHWC image input")
        # Host-side first-conv pre-layout (zp-pad + space-to-depth): pass the
        # target model (or its first Conv2d).  No-op when the model's first
        # layer doesn't qualify (layers.Conv2d.ingest_descriptor).
        self.ingest = None
        if layout_for is not None:
            if quantize_to is None:
                raise ValueError("layout_for requires quantize_to")
            self.ingest = layout_for.ingest_descriptor()

    def __len__(self):
        n = self.images.shape[0]
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    def _prep(self, chunk: np.ndarray) -> Tensor:
        if chunk.dtype == np.uint8:
            if self.resize_to is not None:
                chunk = native.resize_bilinear(chunk, *self.resize_to)
            if self.quantize_to is not None:
                s, zp = self.quantize_to
                q = native.preprocess_quantize(chunk, self.mean, self.std,
                                               float(s), int(zp))
                return wrap_quantized(q, s, zp, self.ingest)
            return Tensor(jnp.asarray(
                native.normalize_nchw(chunk, self.mean, self.std)))
        arr = np.asarray(chunk, np.float32)
        if self.quantize_to is not None:
            s, zp = self.quantize_to
            q = native.quantize_u8(arr, float(s), int(zp))
            return wrap_quantized(q, s, zp, self.ingest)
        return Tensor(jnp.asarray(arr))

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        err: list[BaseException] = []
        stop = threading.Event()   # set when the consumer abandons iteration

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                n = self.images.shape[0]
                for i in range(0, n, self.batch_size):
                    if stop.is_set():
                        return
                    chunk = self.images[i:i + self.batch_size]
                    if self.drop_remainder and chunk.shape[0] < self.batch_size:
                        break
                    t = self._prep(chunk)
                    # Kick off the host->device transfer now; the consumer
                    # blocks on data only when it actually uses it.
                    t = Tensor(jax.device_put(t.data), t.scale, t.zero_point,
                               _nhwc=t._nhwc, _ingest=t._ingest)
                    if self.labels is not None:
                        if not _put((t, self.labels[i:i + chunk.shape[0]])):
                            return
                    elif not _put(t):
                        return
            except BaseException as e:  # surface in consumer
                err.append(e)
            finally:
                _put(_STOP)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is _STOP:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            stop.set()   # unblock the producer if iteration stopped early
