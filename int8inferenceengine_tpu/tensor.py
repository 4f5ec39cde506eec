"""User-facing tensor wrapper.

Replaces the reference's refcounted C++ ``Tensor<T>`` + pybind capsule bridge
(reference: include/tensor.h, src/pybind11.cc) with a thin wrapper over a JAX
array.  JAX owns the memory; numpy interop is zero-copy where XLA allows.

Like the reference tensor (tensor.h:151-154), every tensor carries per-tensor
quantization metadata: ``scale`` (default 1.0) and ``zero_point`` (default 0).
A uint8-dtype tensor is a quantized activation tensor.

TPU twist: convolutions run in NHWC internally (channels on the 128-lane
minor dimension), while the reference API semantics are NCHW (element order
observable through ``reshape``, e.g. ``x.reshape(-1, 800)`` in
unittest/test_quantized_layer.py:82).  A Tensor may therefore hold its data
physically as NHWC (``_nhwc=True``) while reporting the logical NCHW shape;
any op that depends on element order (reshape / numpy export) first
re-materializes NCHW.  Inside a jitted forward, XLA cancels adjacent
transposes, so chained convs never round-trip layouts.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class Tensor:
    """Dense tensor + per-tensor quantization metadata.

    ``data`` may be a concrete jax array or a tracer (inside ``jit``);
    ``scale`` / ``zero_point`` are always static Python scalars, which lets
    kernels specialize on them at trace time.
    """

    __slots__ = ("data", "scale", "zero_point", "_nhwc", "_tp_sharded",
                 "_ingest")

    def __init__(self, data, scale: float = 1.0, zero_point: int = 0,
                 _nhwc: bool = False, _tp_sharded: bool = False,
                 _ingest=None):
        self.data = data
        self.scale = float(scale)
        self.zero_point = int(zero_point)
        self._nhwc = _nhwc
        # True when this holds only the local output-channel shard under
        # shard_map overlap mode (parallel/overlap.py): elementwise ops
        # propagate the flag; Linears either ring-consume or gather.
        self._tp_sharded = _tp_sharded
        # Host-ingest pre-layout tag (data.py layout_for): the DataLoader
        # already applied the first conv's zp-pad + space-to-depth on the
        # host, so data is [n, h', w', s*s*c] u8.  Only the Conv2d whose
        # geometry matches this tag may consume the tensor.
        self._ingest = _ingest

    # -- layout ------------------------------------------------------------
    @property
    def logical_data(self):
        """Data in the reference's logical (NCHW) element order."""
        self._no_ingest("logical_data")
        if self._nhwc:
            return jnp.transpose(self.data, (0, 3, 1, 2))
        return self.data

    def as_nhwc_data(self):
        """Physical NHWC data (for conv/pool); input must be 4D."""
        self._no_ingest("as_nhwc_data")
        if self._nhwc:
            return self.data
        if self.data.ndim != 4:
            raise ValueError(f"expected 4D tensor, got shape {self.shape}")
        return jnp.transpose(self.data, (0, 2, 3, 1))

    def _no_ingest(self, what: str):
        if self._ingest is not None:
            raise ValueError(
                f"{what}: this tensor carries a host-ingest pre-layout "
                f"{self._ingest} (DataLoader layout_for) — only the first "
                "Conv2d with matching geometry can consume it")

    # -- reference Tensor API (i8ie/tensor.py) -------------------------------
    @property
    def shape(self):
        if self._nhwc:
            n, h, w, c = self.data.shape
            return (n, c, h, w)
        return tuple(self.data.shape)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def quantized(self) -> bool:
        return self.data.dtype == jnp.uint8

    def numpy(self):
        return np.asarray(self.logical_data)

    def reshape(self, *args):
        if len(args) == 1 and isinstance(args[0], (tuple, list)):
            args = tuple(args[0])
        out = jnp.reshape(self.logical_data, args)
        # a reshape keeps the last axis a local channel shard (transformer
        # TP flattens/unflattens tokens around head ops) — losing the flag
        # here once made split_heads silently treat a shard as full
        # channels and split it with the GLOBAL head count
        return Tensor(out, self.scale, self.zero_point,
                      _tp_sharded=self._tp_sharded)

    def sum(self):
        return self.numpy().sum()

    def ref_count(self):
        """Capsule-refcount parity shim (reference src/pybind11.cc:26).

        JAX arrays are immutable and reference-counted by Python itself, so
        the reference's manual shared-buffer model has no analogue; we report
        the interpreter refcount for API compatibility.
        """
        import sys
        return sys.getrefcount(self.data) - 1

    def __eq__(self, obj):  # elementwise equality -> float tensor, like i8ie
        other = obj.numpy() if isinstance(obj, Tensor) else np.asarray(obj)
        return Tensor(jnp.asarray(np.float32(self.numpy() == other)))

    def __hash__(self):
        return id(self)

    def __repr__(self):
        # Reference shows dequantized values: (q - zp) * scale
        # (i8ie/tensor.py:8-9).  Never raise from __repr__: pre-laid-out
        # ingest tensors have no NCHW element order to show.
        if self._ingest is not None:
            return (f"Tensor(ingest pre-layout {self._ingest}, physical "
                    f"shape {tuple(self.data.shape)}, scale={self.scale}, "
                    f"zero_point={self.zero_point})")
        return repr((self.numpy() - self.zero_point) * self.scale)


def tensor(ndarray) -> Tensor:
    """Factory matching ``i8ie.tensor`` — always makes a float32 tensor

    (the reference factory is ``Tensor<float>`` only, src/pybind11.cc:38-40).
    """
    arr = np.asarray(_maybe_torch(ndarray), dtype=np.float32)
    return Tensor(jnp.asarray(arr))


def _maybe_torch(x):
    """Accept torch tensors wherever numpy arrays are accepted."""
    if type(x).__module__.startswith("torch"):
        return x.detach().cpu().numpy()
    return x
