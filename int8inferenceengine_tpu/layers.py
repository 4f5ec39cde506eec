"""Layers: Linear and Conv2d with the load -> prepare -> convert lifecycle.

TPU-native re-design of the reference's ``BaseLayer``/``Linear``/``Conv2d``
(reference: include/layer.h, src/layer.cc, src/fully_connected.cc,
src/conv2d.cc).  Semantics preserved for accuracy parity:

* FP32 path computes ``x @ W^T + b`` / conv + bias and, while preparing,
  samples outputs into the calibrator (fully_connected.cc:5-21,
  conv2d.cc:63-98).
* ``convert()`` derives the layer's *output* (scale, zero_point) from the
  calibrator (src/layer.cc:36-54), quantizes weight+bias per-tensor symmetric
  s8 with one joint scale (src/layer.cc:6-26), and frees the FP32 weights.
* INT8 path: u8 activations x s8 weights -> s32 with per-output-channel
  zero-point/bias offset, then the fused ``down_scale`` requantization to the
  calibrated output (scale, zp) (fully_connected.cc:22-52, conv2d.cc:100-142).

TPU-specific departures: weights are stored pre-transposed for the MXU
([K, N] for Linear, HWIO for conv) at convert/load time; activations flow
NHWC through convs; the whole batch is one MXU op instead of an OpenMP loop;
and an optional ``fuse_relu`` folds the subsequent ReLU into the kernel
epilogue.

Params live in a dict of jnp arrays so a Module can pass them through ``jit``
(and shard them over a mesh); scales/zero-points are static Python scalars
that specialize the kernels at trace time.
"""

from __future__ import annotations

import contextvars
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .calibrator import Calibrator
from .config import DEFAULT_CONFIG, QuantConfig
from .ops import conv as conv_ops
from .ops import quant as quant_ops
from .ops import w4 as w4_ops
from .ops.gemm_int8 import KERNEL_ACTS, compute_offset, qgemm
from .tensor import Tensor, _maybe_torch


# Active sink for jitted calibration (Module._calibrate_jit): when set,
# preparing layers emit traced (min, max) reductions into the sink instead of
# sampling eagerly, so one XLA program calibrates the whole forward
# (SURVEY.md §7 hard part 4: stateful observation vs functional JAX).
_CALIB_SINK: contextvars.ContextVar[list | None] = contextvars.ContextVar(
    "i8ie_calib_sink", default=None)

# Cost sink (utils.roofline): when set, layers append (layer, flops, bytes)
# records as the forward is traced — the basis for %-of-peak reporting.
_COST_SINK: contextvars.ContextVar[list | None] = contextvars.ContextVar(
    "i8ie_cost_sink", default=None)

# Input tap (utils.adaround): when set, Linear/Conv2d FP32 forwards append
# their (eager) input activations under id(layer) — AdaRound optimizes each
# layer's weight rounding against the layer's real calibration inputs.
_INPUT_TAP: contextvars.ContextVar[dict | None] = contextvars.ContextVar(
    "i8ie_input_tap", default=None)


# Traced params during Module jit (Module._bind): {id(layer): params_dict}.
# A ContextVar, NOT a layer attribute — bindings are per-thread/per-context,
# so two threads may trace the same model concurrently (e.g. a serving
# engine's scheduler thread compiling its decode step while the main thread
# runs generate()) without leaking tracers across traces.
_BOUND: contextvars.ContextVar[dict | None] = contextvars.ContextVar(
    "i8ie_bound_params", default=None)


def _record_cost(layer, flops: int, nbytes: int) -> None:
    sink = _COST_SINK.get()
    if sink is not None:
        sink.append((layer, int(flops), int(nbytes)))


class Layer:
    """Base layer: weight storage, calibration state, PTQ lifecycle."""

    def __init__(self, config: QuantConfig = DEFAULT_CONFIG):
        self.config = config
        self.params: dict = {}
        self.calibrator: Calibrator | None = None
        self.is_preparing = False
        self.is_quantized = False
        # Layer *output* quantization, set by convert() from calibration
        # (reference defaults: scale=1, zp=0, include/layer.h:46-47).
        self.scale = 1.0
        self.zero_point = 0
        self.weight_scale = 1.0
        self.fuse_relu = False
        # Mixed precision (Module.convert(skip=...)): keep this layer an
        # FP32 island behind the u8 interface (dequant -> float -> requant).
        self.quant_fallback = False
        # Observed activation range, stashed at convert() for observability
        # (the reference's only logging is 3 stderr warnings, layer.cc:31-42).
        self.calib_stats: dict | None = None
        # Set by parallel.sharding when this layer's output channels are
        # sharded over the model axis; forward then all-gathers its output.
        self._tp_sharded = False
        # Transformer TP roles (parallel/sharding.py, Module.tp_roles()):
        # _tp_local: column-parallel layer whose output STAYS channel-
        # sharded (consumed by head-local attention / a row-parallel
        # Linear) instead of being all-gathered.  _tp_row: row-parallel
        # layer (weights sharded on INPUT channels; partial s32
        # accumulators psummed before the requant epilogue).
        self._tp_local = False
        self._tp_row = False

    def _maybe_gather(self, out, channel_axis: int):
        if self._tp_sharded:
            from .parallel.sharding import gather_channels
            return gather_channels(out, channel_axis)
        return out

    @staticmethod
    def _overlap_axes():
        """The active ParallelAxes when overlap mode is on, else None."""
        from .parallel.context import current_axes
        pa = current_axes()
        if pa is not None and pa.overlap and pa.model_size > 1:
            return pa
        return None

    @staticmethod
    def _active_axes():
        """The active ParallelAxes with a real model axis, else None."""
        from .parallel.context import current_axes
        pa = current_axes()
        if pa is not None and pa.model_size > 1:
            return pa
        return None

    def _glue_dtype(self):
        """Compute dtype for calibrated pointwise glue (config.glue_dtype)."""
        return (jnp.bfloat16 if self.config.glue_dtype == "bfloat16"
                else jnp.float32)

    def _observe(self, out) -> None:
        """Record layer output ranges while preparing (eager or traced)."""
        sink = _CALIB_SINK.get()
        if sink is not None:
            sink.append((self, "range", jnp.min(out), jnp.max(out),
                         int(np.prod(out.shape))))
        else:
            self.calibrator.sample(out)

    def _observe_in_mean(self, mean_vec, count: int) -> None:
        """Record the per-input-channel activation mean while preparing
        (bias correction, config.bias_correction)."""
        sink = _CALIB_SINK.get()
        if sink is not None:
            sink.append((self, "in_mean", mean_vec, count))
        else:
            self._merge_in_mean(np.asarray(mean_vec), count)

    def _merge_in_mean(self, mean, count: int) -> None:
        if getattr(self, "_in_mean", None) is None:
            self._in_mean, self._in_count = np.asarray(mean, np.float64), count
        else:
            total = self._in_count + count
            self._in_mean = (self._in_mean * self._in_count
                             + np.asarray(mean, np.float64) * count) / total
            self._in_count = total

    # -- param access (traced params win during jit) ------------------------
    def _src(self):
        bound = _BOUND.get()
        if bound is not None:
            src = bound.get(id(self))
            if src is not None:
                return src
        return self.params

    def _p(self, name):
        return self._src()[name]

    def _scale_w(self):
        """Weight scale: per-channel lives in params (so it traces/shards),
        per-tensor is a static Python float."""
        return self._src().get("w_scale", self.weight_scale)

    # -- lifecycle (reference: src/layer.cc:28-54) ---------------------------
    def prepare(self):
        if self.is_quantized:
            warnings.warn("already quantized")
            return
        self.calibrator = Calibrator(
            exact_minmax=self.config.calib_exact_minmax,
            reservoir_size=self.config.calib_reservoir_size,
            method=self.config.calib_method,
            rounding=self.config.rounding,
        )
        self._in_mean = None    # bias correction (config.bias_correction)
        self._in_count = 0
        self.is_preparing = True

    def convert(self):
        if self.is_quantized:
            warnings.warn("already quantized")
            return
        if not self.is_preparing:
            if not self.config.weight_only:
                warnings.warn(
                    "Not prepared, using default config (scale=1, zp=0)")
        else:
            self.scale, self.zero_point = self.calibrator.get_range(
                self.config.calib_quantile)
            self.calib_stats = self.calibrator.stats()
            self.calibrator = None
        self._quantize_weights()
        self.is_preparing = False
        self.is_quantized = True

    def _quantize_weights(self):
        raise NotImplementedError

    def _load_array(self, arr, expected_shape, what: str):
        a = np.asarray(_maybe_torch(arr), dtype=np.float32)
        if tuple(a.shape) != tuple(expected_shape):
            raise ValueError(
                f"{type(self).__name__}.{what}: shape {a.shape} != expected "
                f"{tuple(expected_shape)}")
        return jnp.asarray(a)


class Linear(Layer):
    """Fully-connected layer; torch-style weight [out, in].

    Reference: src/fully_connected.cc, include/fully_connected.h.
    """

    def __init__(self, in_channels: int, out_channels: int,
                 config: QuantConfig = DEFAULT_CONFIG, fuse_relu: bool = False):
        super().__init__(config)
        self.in_channels = int(in_channels)
        self.out_channels = int(out_channels)
        self.fuse_relu = fuse_relu
        self.params = {
            "weight": jnp.zeros((out_channels, in_channels), jnp.float32),
            "bias": jnp.zeros((out_channels,), jnp.float32),
        }

    def load_weight(self, w):
        self.params["weight"] = self._load_array(
            w, (self.out_channels, self.in_channels), "load_weight")

    def load_bias(self, b):
        self.params["bias"] = self._load_array(
            b, (self.out_channels,), "load_bias")

    def _quantize_weights(self):
        if self.quant_fallback:
            return                      # FP32 island: weights stay float
        per_channel = self.config.weight_per_channel
        rnd = self.config.rounding
        if self.config.weight_only:
            if self.config.weight_bits == 4:
                # W4 grouped weight-only (ops/w4.py): packed nibbles +
                # per-group scales; bias stays f32.
                if self.config.dynamic_act:
                    raise ValueError(
                        "dynamic_act requires s8 weights (weight_bits=8)")
                if getattr(self, "_adaround_qw", None) is not None:
                    # utils.adaround optimized the 4-bit codes directly
                    codes = (self._adaround_qw.astype(jnp.int32) + 8
                             ).astype(jnp.uint8)
                    packed = (codes[:, 0::2] << 4) | codes[:, 1::2]
                    scales = self._adaround_scales
                else:
                    packed, scales = w4_ops.pack_w4(
                        self.params["weight"], self.config.w4_group,
                        optimize=self.config.w4_mse_scales)
                self.params = {"w4_packed": packed, "w4_scales": scales,
                               "bias": self.params["bias"]}
                return
            # W8-float serving mode: keep the float forward, store the
            # weight as s8 + scale (dequantized on the fly; bias stays f32).
            if per_channel:
                q_w, _, s_w = quant_ops.quantize_weight_per_channel(
                    self.params["weight"], self.params["bias"],
                    channel_axis=0, rounding=rnd)
            else:
                q_w, _, s_w = quant_ops.quantize_weight_joint_scale(
                    self.params["weight"], self.params["bias"],
                    rounding=rnd)
            if getattr(self, "_adaround_qw", None) is not None:
                q_w = self._adaround_qw
            self.weight_scale = s_w
            self.params = {"q_weight": q_w, "bias": self.params["bias"]}
            if per_channel:
                self.params["w_scale"] = jnp.asarray(s_w, jnp.float32)
            return
        if self.config.weight_bits == 4:
            # W4A8 (round-4 VERDICT #4): 4-bit grouped weights riding the
            # STATIC u8 activation pipeline — u8 codes in/out with the
            # requant epilogue in-kernel (ops/w4.w4a8_matmul), so W4
            # inherits the static path's glue instead of the float
            # boundaries that made weight-only W4 lose to W8-float.
            if self.config.dynamic_act:
                raise ValueError(
                    "dynamic_act requires s8 weights (weight_bits=8)")
            if getattr(self, "_adaround_qw", None) is not None:
                codes = (self._adaround_qw.astype(jnp.int32) + 8
                         ).astype(jnp.uint8)
                packed = (codes[:, 0::2] << 4) | codes[:, 1::2]
                scales = self._adaround_scales
            else:
                packed, scales = w4_ops.pack_w4(
                    self.params["weight"], self.config.w4_group,
                    optimize=self.config.w4_mse_scales)
            bias = self.params["bias"]
            k_in = self.params["weight"].shape[1]
            wdq = w4_ops.dequant_w4(packed, scales, k_in,
                                    self.config.w4_group)
            if self.config.bias_correction and \
                    getattr(self, "_in_mean", None) is not None:
                bias = bias + (self.params["weight"] - wdq) @ jnp.asarray(
                    self._in_mean, jnp.float32)
            self.params = {"w4_packed": packed, "w4_scales": scales,
                           "bias": bias,
                           # dequantized-weight row sums: the v2
                           # kernel's zero-point fold (ops/w4.py)
                           "w4_wsum": jnp.sum(wdq, axis=1)}
            return
        if per_channel:
            q_w, q_b, s_w = quant_ops.quantize_weight_per_channel(
                self.params["weight"], self.params["bias"], channel_axis=0,
                rounding=rnd)
        else:
            q_w, q_b, s_w = quant_ops.quantize_weight_joint_scale(
                self.params["weight"], self.params["bias"], rounding=rnd)
        if getattr(self, "_adaround_qw", None) is not None:
            # utils.adaround optimized this layer's weight rounding against
            # its calibration inputs; same scale, better integers.
            q_w = self._adaround_qw
        if self.config.bias_correction and \
                getattr(self, "_in_mean", None) is not None:
            # Fold E[(W - s_w*W_q) x] into the bias (config.bias_correction).
            w = self.params["weight"]
            s_col = jnp.asarray(s_w, jnp.float32).reshape(-1, 1)
            err = (w - s_col * q_w.astype(jnp.float32)) @ jnp.asarray(
                self._in_mean, jnp.float32)
            q_b = quant_ops.quantize_s8(self.params["bias"] + err, s_w,
                                        rnd)
        self.weight_scale = s_w
        self.params = {
            "qw_kn": q_w.T,                                  # [K, N] for MXU
            "q_bias": q_b,                                    # [N] s8
            "rowsum": q_w.astype(jnp.int32).sum(axis=1),      # [N]
        }
        if per_channel:
            self.params["w_scale"] = jnp.asarray(s_w, jnp.float32)

    def __call__(self, x: Tensor) -> Tensor:
        if len(x.shape) != 2:
            raise ValueError(
                f"Linear expects a 2D input, got shape {x.shape}; reshape first")
        if x.quantized:
            return self._forward_int8(x)
        return self._forward_fp32(x)

    def _dequant_weight(self):
        s = self._scale_w()
        s = (s.reshape(-1, 1) if hasattr(s, "reshape") and getattr(
            s, "ndim", 0) == 1 else jnp.float32(s))
        return self._p("q_weight").astype(jnp.float32) * s

    def _forward_fp32(self, x: Tensor) -> Tensor:
        if self.is_quantized and not self.quant_fallback:
            if not self.config.weight_only:
                raise RuntimeError(
                    "layer already converted to INT8 — quantize the input "
                    "(FP32 weights were freed, as in the reference)")
            if self.config.weight_bits == 4:
                out = w4_ops.w4_matmul(
                    x.data, self._p("w4_packed"), self._p("w4_scales"),
                    self._p("bias"), self.in_channels,
                    self.config.w4_group, backend=self.config.w4_kernel)
                _record_cost(self, 2 * out.shape[0] * self.in_channels
                             * self.out_channels,
                             x.data.size * 4 + out.size * 4
                             + self.in_channels * self.out_channels // 2)
                return Tensor(self._maybe_gather(out, 1))
            if self.config.dynamic_act:
                # dynamic W8A8, PER-TOKEN scales: each row quantizes with
                # its own symmetric s8 scale (rows are independent tokens /
                # requests in batched serving — one hot row must not starve
                # the others of codes), s8 x s8 on the MXU, per-row dequant
                # + bias in f32
                s_a = jnp.maximum(jnp.max(jnp.abs(x.data), axis=1,
                                          keepdims=True), 1e-8) / 127.0
                a = jnp.clip(jnp.round(x.data / s_a), -127, 127
                             ).astype(jnp.int8)
                acc = lax.dot_general(
                    a, self._p("q_weight").T,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                s_w = self._scale_w()
                s_w = (s_w.reshape(1, -1) if getattr(s_w, "ndim", 0) == 1
                       else jnp.float32(s_w))
                out = (acc.astype(jnp.float32) * (s_a * s_w)
                       + self._p("bias").reshape(1, -1))
            else:
                out = (jnp.dot(x.data, self._dequant_weight().T,
                               preferred_element_type=jnp.float32)
                       + self._p("bias").reshape(1, -1))
            _record_cost(self, 2 * out.shape[0] * self.in_channels
                         * self.out_channels,
                         x.data.size * 4 + out.size * 4
                         + self.in_channels * self.out_channels)
            return Tensor(self._maybe_gather(out, 1))
        pa_row = self._active_axes() if self._tp_row else None
        if pa_row is not None:
            # Row-parallel FP32: weight is the local [N, K_local] slice;
            # psum the f32 partial products (allclose to unsharded — f32
            # addition order differs; the INT8 path is the bit-exact one).
            if _INPUT_TAP.get() is not None:
                raise RuntimeError(
                    "input-tap optimizers (AdaRound/GPTQ) can't observe a "
                    "row-parallel Linear's inputs — run them BEFORE "
                    "shard(), on the unsharded model")
            if self.is_preparing and self.config.bias_correction:
                raise RuntimeError(
                    "bias_correction needs full input-mean statistics, "
                    "which a row-parallel Linear only sees a K-shard of — "
                    "calibrate before shard(), or shard after convert()")
            w_local = self._p("weight")
            k_local = w_local.shape[1]
            if x._tp_sharded:
                a = x.data
            else:
                idx = lax.axis_index(pa_row.model_axis)
                a = lax.dynamic_slice_in_dim(x.data, idx * k_local,
                                             k_local, 1)
            out = lax.psum(
                jnp.dot(a, w_local.T, preferred_element_type=jnp.float32),
                pa_row.model_axis) + self._p("bias").reshape(1, -1)
            if self.is_preparing:
                self._observe(out)
            _record_cost(self, 2 * out.shape[0] * self.in_channels
                         * self.out_channels // pa_row.model_size,
                         4 * (a.size + out.size))
            return Tensor(out)
        if x._tp_sharded:
            from .parallel.sharding import gather_channels
            x = Tensor(gather_channels(x.data, 1), x.scale, x.zero_point)
        tap = _INPUT_TAP.get()
        if tap is not None:
            tap.setdefault(id(self), []).append(x.data)
        out = (
            jnp.dot(x.data, self._p("weight").T,
                    preferred_element_type=jnp.float32)
            + self._p("bias").reshape(1, -1)
        )
        if self.is_preparing:
            self._observe(out)
            if self.config.bias_correction:
                self._observe_in_mean(jnp.mean(x.data, axis=0),
                                      int(x.data.shape[0]))
        _record_cost(self, 2 * out.shape[0] * self.in_channels
                     * self.out_channels,
                     4 * (x.data.size + out.size
                          + self.in_channels * self.out_channels))
        return Tensor(self._maybe_gather(out, 1))

    def _forward_int8(self, x: Tensor, act=None) -> Tensor:
        if not self.is_quantized:
            raise RuntimeError("layer not converted; call convert() first")
        if self.quant_fallback:
            # FP32 island: u8 in, float matmul, u8 out at the calibrated
            # range — downstream layers see a normal quantized tensor.
            if x._tp_sharded:
                from .parallel.sharding import gather_channels
                x = Tensor(gather_channels(x.data, 1), x.scale,
                           x.zero_point)
            f = quant_ops.dequantize_u8(x.data, x.scale, x.zero_point)
            out = (jnp.dot(f, self._p("weight").T,
                           preferred_element_type=jnp.float32)
                   + self._p("bias").reshape(1, -1))
            qo = quant_ops.quantize_u8(out, self.scale, self.zero_point,
                                       self.config.rounding)
            if self.fuse_relu:
                qo = jnp.maximum(qo, jnp.uint8(self.zero_point))
            return Tensor(self._maybe_gather(qo, 1), self.scale,
                          self.zero_point)
        if self.config.weight_bits == 4 and not self.config.weight_only:
            # W4A8: float accumulation over dequantized-in-VMEM 4-bit
            # weights; the recentered u8 activations and the requant
            # epilogue live in the kernel.  TP row-parallelism needs
            # integer partials to psum exactly — not applicable to this
            # float-acc path; use weight_bits=8 for 'row' roles.
            if self._tp_row:
                raise RuntimeError(
                    "W4A8 Linear does not support row-parallel TP "
                    "(float partial sums do not psum bit-exactly); "
                    "keep weight_bits=8 on 'row'-role layers")
            if act is not None:
                raise RuntimeError(
                    "W4A8 has no fused-act epilogue; callers gate on "
                    "weight_bits (fused_linear_act)")
            if x._tp_sharded:
                from .parallel.sharding import gather_channels
                x = Tensor(gather_channels(x.data, 1), x.scale,
                           x.zero_point)
            zpb = (jnp.float32(self.zero_point)
                   + self._p("bias") / jnp.float32(self.scale))
            out = w4_ops.w4a8_matmul(
                x.data, self._p("w4_packed"), self._p("w4_scales"), zpb,
                self.in_channels, self.config.w4_group,
                backend=self.config.w4_kernel,
                zp_x=int(x.zero_point),
                mult=jnp.float32(x.scale) / jnp.float32(self.scale),
                rounding=self.config.rounding,
                wsum=self._p("w4_wsum"))
            if self.fuse_relu:
                out = jnp.maximum(out, jnp.uint8(self.zero_point))
            _record_cost(self, 2 * out.shape[0] * self.in_channels
                         * self.out_channels,
                         x.data.size + out.size
                         + self.in_channels * self.out_channels // 2)
            return Tensor(self._maybe_gather(out, 1), self.scale,
                          self.zero_point)
        if self._tp_row:
            pa_row = self._active_axes()
            if pa_row is not None:
                return self._forward_int8_row(x, pa_row, act)
            raise RuntimeError(
                "row-parallel Linear called outside an active TP context "
                "(its rowsum/weight params are shard-structured); run "
                "through the sharded forward — module(x) after shard() — "
                "not a direct eager/jit call")
        pa = self._overlap_axes()
        oc = compute_offset(self._p("q_bias"), self._p("rowsum"),
                            scale_a=x.scale, zp_a=x.zero_point,
                            recentered=True)
        if x._tp_sharded:
            if pa is not None and self._tp_sharded:
                # Ring TP: consume the predecessor's channel shard directly,
                # overlapping the gather (ppermute) with partial MXU work.
                from .parallel.overlap import ring_qgemm
                out = ring_qgemm(
                    x.data, self._p("qw_kn"), oc,
                    axis_name=pa.model_axis, axis_size=pa.model_size,
                    scale_a=x.scale, zp_a=x.zero_point,
                    scale_w=self._scale_w(), scale_c=self.scale,
                    zp_c=self.zero_point, relu=self.fuse_relu)
                return Tensor(out, self.scale, self.zero_point,
                              _tp_sharded=True)
            from .parallel.sharding import gather_channels
            x = Tensor(gather_channels(x.data, 1), x.scale, x.zero_point)
        out = qgemm(
            x.data, self._p("qw_kn"), oc,
            backend=self.config.kernel_backend,
            scale_a=x.scale, zp_a=x.zero_point, scale_w=self._scale_w(),
            scale_c=self.scale, zp_c=self.zero_point, relu=self.fuse_relu,
            rounding=self.config.rounding, act=act)
        _record_cost(self, 2 * out.shape[0] * self.in_channels
                     * self.out_channels,
                     x.data.size + out.size
                     + self.in_channels * self.out_channels)
        if act is not None:
            if self._tp_sharded and (pa is not None or (
                    self._tp_local and self._active_axes() is not None)):
                return Tensor(out, act[1], act[2], _tp_sharded=True)
            return Tensor(self._maybe_gather(out, 1), act[1], act[2])
        if self._tp_sharded and pa is not None:
            return Tensor(out, self.scale, self.zero_point, _tp_sharded=True)
        if self._tp_sharded and self._tp_local \
                and self._active_axes() is not None:
            # column-parallel with a sharded consumer (head-local attention
            # or a row-parallel Linear): skip the all-gather entirely.
            return Tensor(out, self.scale, self.zero_point, _tp_sharded=True)
        return Tensor(self._maybe_gather(out, 1), self.scale, self.zero_point)

    def _forward_int8_row(self, x: Tensor, pa, act=None) -> Tensor:
        """Row-parallel INT8 forward (ops/gemm_int8.qgemm_row_parallel):
        weights sharded on input channels; consumes the producer's
        channel shard directly (or slices a replicated input), psums the
        s32 partial accumulators, and requantizes once — bit-identical
        to the unsharded layer (integer addition is associative)."""
        from .ops.gemm_int8 import qgemm_row_parallel
        w_local = self._p("qw_kn")                       # [K_local, N]
        k_local = w_local.shape[0]
        if x._tp_sharded:
            if x.data.shape[-1] != k_local:
                raise ValueError(
                    f"row-parallel Linear expected a [*, {k_local}] input "
                    f"shard, got {x.data.shape}")
            a = x.data
        else:
            idx = lax.axis_index(pa.model_axis)
            a = lax.dynamic_slice_in_dim(x.data, idx * k_local, k_local, 1)
        rs = self._p("rowsum")
        if rs.ndim == 2:                  # [1, N] slice of the stacked
            rs = rs[0]                    # per-shard rowsums
        out = qgemm_row_parallel(
            a, w_local, rs, self._p("q_bias"),
            axis_name=pa.model_axis, scale_a=x.scale, zp_a=x.zero_point,
            scale_w=self._scale_w(), scale_c=self.scale,
            zp_c=self.zero_point, relu=self.fuse_relu,
            rounding=self.config.rounding, act=act)
        _record_cost(self, 2 * out.shape[0] * self.in_channels
                     * self.out_channels // pa.model_size,
                     a.size + out.size
                     + self.in_channels * self.out_channels
                     // pa.model_size)
        if act is not None:
            return Tensor(out, act[1], act[2])
        return Tensor(out, self.scale, self.zero_point)


class Conv2d(Layer):
    """2D convolution; torch-style weight [out_c, in_c, kh, kw].

    Reference: src/conv2d.cc, include/conv2d.h.  Internally NHWC with the
    weight held HWIO; the batch im2col/GEMM or XLA's native integer conv
    replaces the reference's per-sample OpenMP im2col loop.
    """

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int,
                 stride: int = 1, padding: int = 0, groups: int = 1,
                 config: QuantConfig = DEFAULT_CONFIG, fuse_relu: bool = False):
        super().__init__(config)
        if stride == 0:
            raise ValueError("stride must be >= 1 (reference: conv2d.h:12-14)")
        if in_channels % groups or out_channels % groups:
            raise ValueError(
                f"groups={groups} must divide in_channels={in_channels} and "
                f"out_channels={out_channels}")
        self.in_channels = int(in_channels)
        self.out_channels = int(out_channels)
        self.kernel_size = int(kernel_size)
        self.stride = int(stride)
        self.padding = int(padding)
        self.groups = int(groups)
        self.fuse_relu = fuse_relu
        k = self.kernel_size
        self.params = {
            "w_hwio": jnp.zeros((k, k, in_channels // groups, out_channels),
                                jnp.float32),
            "bias": jnp.zeros((out_channels,), jnp.float32),
        }

    def load_weight(self, w):
        k = self.kernel_size
        oihw = self._load_array(
            w, (self.out_channels, self.in_channels // self.groups, k, k),
            "load_weight")
        self.params["w_hwio"] = jnp.transpose(oihw, (2, 3, 1, 0))

    def load_bias(self, b):
        self.params["bias"] = self._load_array(
            b, (self.out_channels,), "load_bias")

    def _quantize_weights(self):
        if self.quant_fallback:
            return                      # FP32 island: weights stay float
        per_channel = self.config.weight_per_channel
        rnd = self.config.rounding
        if self.config.weight_only:
            if per_channel:
                q_w, _, s_w = quant_ops.quantize_weight_per_channel(
                    self.params["w_hwio"], self.params["bias"],
                    channel_axis=3, rounding=rnd)
            else:
                q_w, _, s_w = quant_ops.quantize_weight_joint_scale(
                    self.params["w_hwio"], self.params["bias"],
                    rounding=rnd)
            if getattr(self, "_adaround_qw", None) is not None:
                q_w = self._adaround_qw
            self.weight_scale = s_w
            self.params = {"q_w_hwio": q_w, "bias": self.params["bias"]}
            if per_channel:
                self.params["w_scale"] = jnp.asarray(s_w, jnp.float32)
            return
        if per_channel:
            q_w, q_b, s_w = quant_ops.quantize_weight_per_channel(
                self.params["w_hwio"], self.params["bias"], channel_axis=3,
                rounding=rnd)
        else:
            q_w, q_b, s_w = quant_ops.quantize_weight_joint_scale(
                self.params["w_hwio"], self.params["bias"], rounding=rnd)
        if getattr(self, "_adaround_qw", None) is not None:
            q_w = self._adaround_qw                   # see utils.adaround
        if self.config.bias_correction and self.groups == 1 and \
                getattr(self, "_in_mean", None) is not None:
            # Fold E[(W - s_w*W_q) x] into the bias (config.bias_correction;
            # zp-padding edge effects are ignored, as is standard).
            w = self.params["w_hwio"]
            deq = jnp.asarray(s_w, jnp.float32) * q_w.astype(jnp.float32)
            err = jnp.einsum("hwio,i->o", w - deq,
                             jnp.asarray(self._in_mean, jnp.float32))
            q_b = quant_ops.quantize_s8(self.params["bias"] + err, s_w,
                                        rnd)
        self.weight_scale = s_w
        self.params = {
            "qw_hwio": q_w,                                          # s8 HWIO
            "q_bias": q_b,                                            # [N] s8
            "rowsum": q_w.astype(jnp.int32).sum(axis=(0, 1, 2)),      # [N]
        }
        if per_channel:
            self.params["w_scale"] = jnp.asarray(s_w, jnp.float32)

    def ingest_descriptor(self):
        """Host-ingest pre-layout tag for this conv, or None.

        When this conv is the model's first layer and would be rewritten by
        space-to-depth on device (strided, small input-channel count,
        conv.py conv2d_int8_xla), the DataLoader can apply the zp-pad +
        space-to-depth on the host instead (data.py ``layout_for``), so the
        device program starts directly at the stride-1 conv.
        """
        if (self.stride > 1 and self.in_channels < 32 and self.groups == 1
                and self._conv_backend() == "xla_conv"):
            return ("s2d", self.kernel_size, self.stride, self.padding,
                    self.in_channels)
        return None

    def __call__(self, x: Tensor) -> Tensor:
        if x._ingest is not None:
            if not x.quantized:
                raise ValueError("pre-laid-out ingest tensors are u8")
            if x._ingest != self.ingest_descriptor():
                raise ValueError(
                    f"ingest pre-layout {x._ingest} does not match this "
                    f"conv's geometry {self.ingest_descriptor()} — "
                    "DataLoader layout_for must target the model's first "
                    "Conv2d")
            return self._forward_int8(x)
        if len(x.shape) != 4:
            raise ValueError(f"Conv2d expects a 4D input, got {x.shape}")
        if x.quantized:
            return self._forward_int8(x)
        return self._forward_fp32(x)

    def _forward_fp32(self, x: Tensor) -> Tensor:
        if self.is_quantized and not self.quant_fallback:
            if not self.config.weight_only:
                raise RuntimeError(
                    "layer already converted to INT8 — quantize the input")
            s = self._scale_w()
            s = (s.reshape(1, 1, 1, -1)
                 if hasattr(s, "reshape") and getattr(s, "ndim", 0) == 1
                 else jnp.float32(s))
            if self.config.dynamic_act:
                # per-image scales (the conv analog of per-token)
                xn = x.as_nhwc_data()
                s_a = jnp.maximum(jnp.max(jnp.abs(xn), axis=(1, 2, 3),
                                          keepdims=True), 1e-8) / 127.0
                a = jnp.clip(jnp.round(xn / s_a), -127, 127
                             ).astype(jnp.int8)
                acc = lax.conv_general_dilated(
                    a, self._p("q_w_hwio"),
                    window_strides=(self.stride, self.stride),
                    padding=[(self.padding, self.padding)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=self.groups,
                    preferred_element_type=jnp.int32)
                out = (acc.astype(jnp.float32) * (s_a * s)
                       + self._p("bias").reshape(1, 1, 1, -1))
            else:
                w = self._p("q_w_hwio").astype(jnp.float32) * s
                out = conv_ops.conv2d_fp32(
                    x.as_nhwc_data(), w, self._p("bias"),
                    self.stride, self.padding, groups=self.groups)
            _record_cost(self, 2 * out.size
                         * (self.in_channels // self.groups)
                         * self.kernel_size ** 2,
                         4 * (x.data.size + out.size)
                         + self._p("q_w_hwio").size)
            return Tensor(out, _nhwc=True)
        tap = _INPUT_TAP.get()
        if tap is not None:
            tap.setdefault(id(self), []).append(x.as_nhwc_data())
        out = conv_ops.conv2d_fp32(
            x.as_nhwc_data(), self._p("w_hwio"), self._p("bias"),
            self.stride, self.padding, groups=self.groups)
        if self.is_preparing:
            self._observe(out)
            if self.config.bias_correction and self.groups == 1:
                xn = x.as_nhwc_data()
                self._observe_in_mean(
                    jnp.mean(xn, axis=(0, 1, 2)),
                    int(np.prod(xn.shape[:3])))
        _record_cost(self, 2 * out.size * (self.in_channels // self.groups)
                     * self.kernel_size ** 2,
                     4 * (x.data.size + out.size
                          + self._p("w_hwio").size))
        return Tensor(self._maybe_gather(out, 3), _nhwc=True)

    def _forward_int8(self, x: Tensor) -> Tensor:
        if not self.is_quantized:
            raise RuntimeError("layer not converted; call convert() first")
        if self.quant_fallback:
            # FP32 island (Module.convert(skip=...)): u8 in, float conv,
            # u8 out at the calibrated range.
            f = quant_ops.dequantize_u8(x.as_nhwc_data(), x.scale,
                                        x.zero_point)
            out = conv_ops.conv2d_fp32(f, self._p("w_hwio"),
                                       self._p("bias"), self.stride,
                                       self.padding, groups=self.groups)
            qo = quant_ops.quantize_u8(out, self.scale, self.zero_point,
                                       self.config.rounding)
            if self.fuse_relu:
                qo = jnp.maximum(qo, jnp.uint8(self.zero_point))
            return Tensor(self._maybe_gather(qo, 3), self.scale,
                          self.zero_point, _nhwc=True)
        oc = compute_offset(self._p("q_bias"), self._p("rowsum"),
                            scale_a=x.scale, zp_a=x.zero_point,
                            recentered=True)
        kw = dict(scale_a=x.scale, zp_a=x.zero_point,
                  scale_w=self._scale_w(), scale_c=self.scale,
                  zp_c=self.zero_point, relu=self.fuse_relu,
                  rounding=self.config.rounding)
        backend = self._conv_backend()
        if self.groups > 1:
            backend = "xla_conv"   # grouped convs go through XLA's native path
        qw_hwio = self._p("qw_hwio")
        if x._ingest is not None:
            out = conv_ops.conv2d_int8_xla(
                x.data, qw_hwio, oc, input_pre_s2d=True,
                stride=self.stride, padding=self.padding, groups=self.groups,
                epilogue_dtype=self.config.epilogue_dtype, **kw)
        elif backend == "xla_conv":
            out = conv_ops.conv2d_int8_xla(
                x.as_nhwc_data(), qw_hwio, oc,
                stride=self.stride, padding=self.padding, groups=self.groups,
                epilogue_dtype=self.config.epilogue_dtype, **kw)
        else:
            k = self.kernel_size
            qw_kn = qw_hwio.reshape(k * k * self.in_channels,
                                    self.out_channels)
            out = conv_ops.conv2d_int8_gemm(
                x.as_nhwc_data(), qw_kn, oc,
                kh=k, kw=k, stride=self.stride, padding=self.padding,
                backend=self.config.kernel_backend, **kw)
        _record_cost(self, 2 * out.size * (self.in_channels // self.groups)
                     * self.kernel_size ** 2,
                     x.data.size + out.size
                     + (self.in_channels // self.groups) * self.out_channels
                     * self.kernel_size ** 2)
        return Tensor(self._maybe_gather(out, 3), self.scale,
                      self.zero_point, _nhwc=True)

    def _conv_backend(self) -> str:
        impl = self.config.conv_backend
        if impl == "auto":
            return "xla_conv"
        return impl


class QuantConcat(Layer):
    """Calibrated channel concatenation — the Fire/Inception primitive.

    Not in the reference (its CNNs are straight chains); required by
    SqueezeNet-style expand branches.  Same PTQ lifecycle as QuantAdd: while
    preparing, the FP32 concat's range is observed; after convert(), each
    quantized input (at its own (scale, zp)) is requantized to this layer's
    calibrated output range — one affine map per input on the VPU, fused by
    XLA into the concatenate — so downstream layers see a single
    per-tensor-quantized activation, exactly as after any conv boundary
    (the analogue of down_scale at a layer edge, quantize_utils.cc:27-36).
    """

    def __init__(self, config: QuantConfig = DEFAULT_CONFIG,
                 fuse_relu: bool = False):
        super().__init__(config)
        self.fuse_relu = fuse_relu

    def _quantize_weights(self):  # no weights to quantize
        pass

    def __call__(self, *xs: Tensor) -> Tensor:
        if len(xs) < 2:
            raise ValueError("QuantConcat needs at least two inputs")
        first = xs[0]
        if any(x.quantized != first.quantized for x in xs):
            raise ValueError(
                "QuantConcat: all inputs must be quantized or all float")
        axis = 3 if first._nhwc else 1   # channel dim in either layout
        datas = [QuantAdd._aligned(first, x) for x in xs]
        if not first.quantized:
            out = jnp.concatenate(datas, axis=axis)
            if self.is_preparing:
                self._observe(out)
            return Tensor(out, _nhwc=first._nhwc)
        if not self.is_quantized:
            raise RuntimeError("layer not converted; call convert() first")
        dt = self._glue_dtype()
        requant = [
            quant_ops.quantize_u8(
                quant_ops.dequantize_u8(d, x.scale, x.zero_point, dtype=dt),
                self.scale, self.zero_point, self.config.rounding)
            for d, x in zip(datas, xs)
        ]
        out = jnp.concatenate(requant, axis=axis)
        if self.fuse_relu:
            out = jnp.maximum(out, jnp.uint8(self.zero_point))
        return Tensor(out, self.scale, self.zero_point, _nhwc=first._nhwc)


class QuantAct(Layer):
    """Calibrated nonlinear activation in the quantized domain.

    Not in the reference (its only nonlinearity is ReLU, which needs no
    calibration — clamping at the zero_point is exact, functional.cc:15-26).
    Required by MobileNetV3/EfficientNet-era nets whose hardswish / silu /
    gelu activations change the value distribution, so the output needs its
    own calibrated (scale, zp) like any compute layer.

    Same PTQ lifecycle as QuantAdd: while preparing, the FP32 activation's
    output range is observed; after convert(), the quantized input is mapped
    ``u8 -> dequant -> fn -> requant -> u8`` at this layer's calibrated
    output range.  Two INT8 backends, bit-identical by construction:

    * ``elementwise`` (default): the float map runs on the VPU and XLA fuses
      it into the neighbouring conv epilogue — no extra HBM round-trip.
      TPU-idiomatic: even silu/gelu are a handful of VPU transcendentals.
    * ``lut``: since both (scale, zp) pairs are static at trace time, the
      whole map collapses to a 256-entry u8->u8 table (the classic CPU int8
      trick), applied as a gather.  Kept for exactness tests and as an
      escape hatch for expensive custom ``fn``s.
    """

    def __init__(self, fn="hardswish", config: QuantConfig = DEFAULT_CONFIG,
                 backend: str = "elementwise"):
        super().__init__(config)
        from .ops.functional import ACTIVATIONS
        if callable(fn):
            self.fn = fn
            self.fn_name = getattr(fn, "__name__", "custom")
        else:
            try:
                self.fn = ACTIVATIONS[fn]
            except KeyError:
                raise ValueError(
                    f"unknown activation {fn!r}; available: "
                    f"{sorted(ACTIVATIONS)} (or pass a callable)")
            self.fn_name = fn
        if backend not in ("elementwise", "lut"):
            raise ValueError(f"backend must be 'elementwise' or 'lut', "
                             f"got {backend!r}")
        self.backend = backend

    def _quantize_weights(self):  # no weights to quantize
        pass

    def __call__(self, x: Tensor) -> Tensor:
        if not x.quantized:
            out = self.fn(x.data)
            if self.is_preparing:
                self._observe(out)
            return Tensor(out, _nhwc=x._nhwc, _tp_sharded=x._tp_sharded)
        if not self.is_quantized:
            raise RuntimeError("layer not converted; call convert() first")
        if self.backend == "lut":
            codes = jnp.arange(256, dtype=jnp.uint8)
            lut = quant_ops.quantize_u8(
                self.fn(quant_ops.dequantize_u8(codes, x.scale,
                                                x.zero_point,
                                                dtype=self._glue_dtype())),
                self.scale, self.zero_point, self.config.rounding)
            out = jnp.take(lut, x.data.astype(jnp.int32))
        else:
            f = self.fn(quant_ops.dequantize_u8(x.data, x.scale,
                                                x.zero_point,
                                                dtype=self._glue_dtype()))
            out = quant_ops.quantize_u8(f, self.scale, self.zero_point,
                                        self.config.rounding)
        return Tensor(out, self.scale, self.zero_point, _nhwc=x._nhwc,
                      _tp_sharded=x._tp_sharded)


class QuantMul(Layer):
    """Calibrated elementwise multiply — the squeeze-excite gating primitive.

    Not in the reference (no attention-style gating in its CNNs); required
    by SE blocks (MobileNetV3, EfficientNet) where a per-channel gate
    [N, 1, 1, C] scales the trunk [N, H, W, C].  Mirrors QuantAdd: while
    preparing, the FP32 product's range is observed; after convert(), both
    quantized factors are dequantized on the VPU, multiplied (with
    broadcasting), and requantized to this layer's calibrated output range.
    XLA fuses the whole thing into one elementwise kernel.
    """

    def __init__(self, config: QuantConfig = DEFAULT_CONFIG):
        super().__init__(config)

    def _quantize_weights(self):  # no weights to quantize
        pass

    def __call__(self, a: Tensor, b: Tensor) -> Tensor:
        if a.quantized != b.quantized:
            raise ValueError(
                "QuantMul: both inputs must be quantized or both float")
        b_data = QuantAdd._aligned(a, b)
        if not a.quantized:
            out = a.data * b_data
            if self.is_preparing:
                self._observe(out)
            return Tensor(out, _nhwc=a._nhwc)
        if not self.is_quantized:
            raise RuntimeError("layer not converted; call convert() first")
        dt = self._glue_dtype()
        fa = quant_ops.dequantize_u8(a.data, a.scale, a.zero_point, dtype=dt)
        fb = quant_ops.dequantize_u8(b_data, b.scale, b.zero_point, dtype=dt)
        q = quant_ops.quantize_u8(fa * fb, self.scale, self.zero_point,
                                  self.config.rounding)
        return Tensor(q, self.scale, self.zero_point, _nhwc=a._nhwc,
                      _tp_sharded=a._tp_sharded)


class QuantMatmul(Layer):
    """Calibrated activation x activation batched matmul — the attention
    primitive (``QK^T`` and ``P@V``).

    Not in the reference (it only multiplies activations by weights, whose
    zero-point offsets are static at convert time; src/fully_connected.cc,
    src/conv2d.cc).  Here both operands are quantized activations, so the
    offset correction uses on-device row/column sums — see
    ``ops/qmatmul.qmatmul_act`` for the exact-integer math.  ``alpha``
    (e.g. 1/sqrt(head_dim)) folds into the static requant multiplier for
    free.  Leading dims are batch dims; set ``transpose_b`` for ``QK^T``.
    """

    def __init__(self, alpha: float = 1.0, transpose_b: bool = False,
                 config: QuantConfig = DEFAULT_CONFIG):
        super().__init__(config)
        self.alpha = float(alpha)
        self.transpose_b = transpose_b

    def _quantize_weights(self):  # no weights to quantize
        pass

    def __call__(self, a: Tensor, b: Tensor) -> Tensor:
        if a.quantized != b.quantized:
            raise ValueError(
                "QuantMatmul: both inputs must be quantized or both float")
        if a._nhwc or b._nhwc:
            raise ValueError("QuantMatmul expects token-major tensors "
                             "(no NHWC image layout)")
        if a._tp_sharded != b._tp_sharded:
            raise ValueError(
                "QuantMatmul: operands must agree on head sharding (one "
                "is a local head shard, the other is replicated)")
        if not a.quantized:
            bd = jnp.swapaxes(b.data, -1, -2) if self.transpose_b else b.data
            out = self.alpha * jnp.matmul(
                a.data, bd, preferred_element_type=jnp.float32)
            if self.is_preparing:
                self._observe(out)
            return Tensor(out, _tp_sharded=a._tp_sharded)
        if not self.is_quantized:
            raise RuntimeError("layer not converted; call convert() first")
        from .ops.qmatmul import qmatmul_act
        out = qmatmul_act(
            a.data, b.data, scale_a=a.scale, zp_a=a.zero_point,
            scale_b=b.scale, zp_b=b.zero_point, scale_c=self.scale,
            zp_c=self.zero_point, alpha=self.alpha,
            transpose_b=self.transpose_b, rounding=self.config.rounding)
        _record_cost(self, 2 * out.size * a.data.shape[-1],
                     a.data.size + b.data.size + out.size)
        # head-sharded attention: batched per-(b, h) matmuls are exact on
        # a local head shard — propagate the flag
        return Tensor(out, self.scale, self.zero_point,
                      _tp_sharded=a._tp_sharded)


def alibi_slopes(n_heads: int):
    """The ALiBi slope ladder (Press et al., ICLR'22): for H a power of
    two, ``m_h = 2^(-8(h+1)/H)``; otherwise the standard interpolation
    (closest power of two, then odd steps of the doubled ladder)."""
    import math

    def pow2_ladder(n):
        start = 2.0 ** (-8.0 / n)
        return [start ** (i + 1) for i in range(n)]

    if n_heads & (n_heads - 1) == 0:
        return tuple(pow2_ladder(n_heads))
    closest = 2 ** int(math.floor(math.log2(n_heads)))
    base = pow2_ladder(closest)
    extra = pow2_ladder(2 * closest)[0::2][: n_heads - closest]
    return tuple(base + extra)


class QuantSoftmax(Layer):
    """Calibrated softmax over the last axis (attention probabilities).

    FP32 path observes the softmax output range while preparing; INT8 path
    dequantizes the u8 scores, runs a numerically-stable softmax in f32 on
    the VPU, and requantizes to the calibrated output range.  (Keeping
    softmax in float between int8 GEMMs is standard INT8-transformer
    practice; the exp/sum never round-trips HBM thanks to XLA fusion.)

    ``causal=True`` masks score columns above the diagonal with -inf
    before the softmax (decoder attention).  ``valid_len`` (a traced
    scalar) masks columns >= valid_len instead — the KV-cache decode path,
    where scores span the whole static cache but only the first
    ``valid_len`` positions are live.  Masked positions quantize to
    exactly the zero_point code, so they contribute exactly zero to the
    downstream P@V zero-point math (ops/qmatmul.py).

    ``window`` (mistral-family sliding-window attention): each position
    additionally ignores columns more than ``window`` back — the square
    causal mask gains ``col > row - window``, the valid_len forms gain
    ``col >= valid_len - window``.  The decode paths mirror it in the
    flat kernel's span ladder (ops/attention.py), which also caps decode
    DMA/compute at ~window regardless of context length.

    ``softcap`` (gemma family): scores pass ``softcap * tanh(x /
    softcap)`` BEFORE masking+softmax — tanh is monotone, so greedy
    argmax over the downstream codes is unaffected; the probability
    distribution (sampling) is what changes.  Applied on the
    dequantized f32 scores in both the composed path and the decode
    kernel's tail (ops/attention.py).

    ``alibi_heads`` (BLOOM/MPT family): Attention-with-Linear-Biases —
    scores gain a per-head bias ``m_h * (col - row_position)`` (zero at
    the diagonal, increasingly negative into the past) INSTEAD of any
    positional embedding; ``m_h`` is the standard geometric ladder
    ``2^(-8h/H)``.  The bias is a static function of ABSOLUTE
    positions, so the u8-KV-cache invariant (cached decode ==
    full-forward recompute) holds unchanged; the decode fast path
    routes through the XLA lowering (the Pallas kernel has no per-head
    bias tail — ops/attention.py forces backend='xla' when alibi is
    set).  Scores must carry the head axis at dim -3 ([B, H, tq, tk]).
    """

    def __init__(self, config: QuantConfig = DEFAULT_CONFIG,
                 causal: bool = False, window: int | None = None,
                 softcap: float | None = None,
                 alibi_heads: int | None = None):
        super().__init__(config)
        self.causal = causal
        self.window = None if window is None else int(window)
        self.softcap = None if softcap is None else float(softcap)
        self.alibi_slopes = (None if alibi_heads is None
                             else alibi_slopes(int(alibi_heads)))

    def _quantize_weights(self):  # no weights to quantize
        pass

    def _masked(self, f, valid_len):
        if self.softcap is not None:
            c = jnp.float32(self.softcap)
            f = c * jnp.tanh(f / c)
        tq, tk = f.shape[-2], f.shape[-1]
        if self.alibi_slopes is not None:
            m = jnp.asarray(self.alibi_slopes,
                            jnp.float32).reshape(-1, 1, 1)
            col = lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
            if self.causal and tq > 1 and tq == tk:
                # square prefill: row position == row index
                rowp = lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
            elif valid_len is not None:
                # decode / cached extend: the query's absolute
                # position is valid_len - 1 (per row on the extend)
                rowp = valid_len - 1
            else:
                rowp = jnp.int32(tk - 1)
            # negative into the past, 0 at the diagonal; future columns
            # get positive garbage that the causal mask -infs anyway
            f = f + m * (col - rowp).astype(jnp.float32)
        window_done = False
        if self.causal and tq > 1 and tq == tk:
            # square scores: triangular causal mask; a valid_len on top
            # (right-padded prefill) masks columns too — the masks
            # compose, neither replaces the other
            row = lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
            col = lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
            keep = col <= row
            if self.window is not None:
                # the PER-ROW window; the valid_len clause below must
                # not re-apply a valid_len-relative bound here (it
                # would void every row < valid_len - window -> NaN
                # softmax; round-4 review finding)
                keep = keep & (col > row - self.window)
            f = jnp.where(keep, f, -jnp.inf)
            window_done = True
        elif self.causal and tq > 1:
            # non-square multi-row scores are the cached multi-token
            # extend path, where the PER-ROW valid_len (pos + row + 1)
            # IS the causal mask over the cache — it must be supplied
            # AND be per-row shaped: a scalar/batch valid_len here would
            # silently let every row see every later row's position
            # (reported by the round-3 review; the check keeps the old
            # loud-failure contract for that misuse).
            if valid_len is None or not (
                    getattr(valid_len, "ndim", 0) >= 2
                    and valid_len.shape[-2] == tq):
                raise ValueError(
                    f"causal softmax expects square scores, got {f.shape}; "
                    "cached multi-row decode passes a PER-ROW valid_len "
                    "(shape [..., tq, 1], row j = pos + j + 1) instead")
        if valid_len is not None:
            col = lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
            keep = col < valid_len
            if self.window is not None and not window_done:
                # valid_len IS the per-row horizon on the non-square
                # paths (decode / cached extend), so the window lower
                # bound hangs off it; on the square-causal compose path
                # the row-relative window already applied above
                keep = keep & (col >= valid_len - self.window)
            f = jnp.where(keep, f, -jnp.inf)
        return f

    def __call__(self, x: Tensor, valid_len=None) -> Tensor:
        if not x.quantized:
            out = jax.nn.softmax(self._masked(x.data, valid_len), axis=-1)
            if self.is_preparing:
                self._observe(out)
            return Tensor(out, _tp_sharded=x._tp_sharded)
        if not self.is_quantized:
            raise RuntimeError("layer not converted; call convert() first")
        f = quant_ops.dequantize_u8(x.data, x.scale, x.zero_point)
        out = quant_ops.quantize_u8(
            jax.nn.softmax(self._masked(f, valid_len), axis=-1),
            self.scale, self.zero_point, self.config.rounding)
        # softmax rows live within one head: exact on a local head shard
        return Tensor(out, self.scale, self.zero_point,
                      _tp_sharded=x._tp_sharded)


def weight_quant_spec(layer):
    """(weight, broadcastable scale, clip bound, group scales or None):
    the scale policy ``convert()`` will apply to this layer's weights —
    THE single source of truth for pre-convert optimizers (utils.adaround,
    utils.gptq).  Must mirror Linear/Conv2d._quantize_weights; keeping it
    here (next to that code) is what prevents the two from drifting.
    """
    if isinstance(layer, Linear):
        w, axis = layer.params["weight"], 0
    else:
        w, axis = layer.params["w_hwio"], 3
    b = layer.params["bias"]
    cfg = layer.config
    if cfg.weight_bits == 4 and isinstance(layer, Linear):
        # both W4 weight-only and static W4A8 quantize Linear weights to
        # grouped 4-bit codes — same spec for pre-convert optimizers
        from .ops.w4 import pack_w4
        _, scales = pack_w4(w, cfg.w4_group, optimize=cfg.w4_mse_scales)
        n, k = w.shape
        g = min(cfg.w4_group, k)
        s_full = jnp.repeat(scales, g, axis=1)[:, :k]
        return w, s_full, 7.0, scales
    if cfg.weight_per_channel:
        _, _, sc = quant_ops.quantize_weight_per_channel(w, b,
                                                         channel_axis=axis)
        shape = [1] * w.ndim
        shape[axis] = -1
        return w, jnp.asarray(sc, jnp.float32).reshape(shape), 127.0, None
    _, _, sc = quant_ops.quantize_weight_joint_scale(w, b)
    return w, jnp.float32(sc), 127.0, None


def fused_qkv(wq: "Linear", wk: "Linear", wv: "Linear",
              x: Tensor) -> tuple:
    """One GEMM for the three attention projections sharing input ``x``
    (ops/gemm_int8.qgemm_multi): bit-identical to calling each Linear,
    one kernel launch instead of three.  Models gate on
    ``QuantConfig.fuse_qkv``; falls back composed when not applicable
    (unconverted, float input, TP-sharded, fuse_relu)."""
    heads = (wq, wk, wv)
    if wq.config.weight_bits == 4:
        merged = fused_w4a8_multi(heads, x)
        if merged is not None:
            return merged
    fusable = (x.quantized
               and all(l.is_quantized and not l.quant_fallback
                       and not l.fuse_relu and not l._tp_sharded
                       for l in heads)
               and not x._tp_sharded
               and not wq.config.weight_only
               and wq.config.weight_bits == 8)
    if not fusable:
        return wq(x), wk(x), wv(x)
    from .ops.gemm_int8 import qgemm_multi
    parts = []
    for l in heads:
        oc = compute_offset(l._p("q_bias"), l._p("rowsum"),
                            scale_a=x.scale, zp_a=x.zero_point,
                            recentered=True)
        parts.append(dict(w_s8_kn=l._p("qw_kn"), oc=oc,
                          scale_w=l._scale_w(), scale_c=l.scale,
                          zp_c=l.zero_point))
    mode = wq.config.fuse_qkv
    outs = qgemm_multi(x.data, parts, scale_a=x.scale, zp_a=x.zero_point,
                       rounding=wq.config.rounding,
                       backend="auto" if mode in ("auto", "off") else mode)
    for l, o in zip(heads, outs):
        _record_cost(l, 2 * o.shape[0] * l.in_channels * l.out_channels,
                     x.data.size + o.size
                     + l.in_channels * l.out_channels)
    return tuple(Tensor(o, l.scale, l.zero_point)
                 for l, o in zip(heads, outs))


def fused_w4a8_multi(layers, x: Tensor):
    """Several W4A8 Linears sharing input ``x`` as one kernel call
    (ops/w4.w4a8_matmul_multi — the per-column requant makes the merge
    bit-identical to per-layer calls).  Returns the per-layer output
    Tensors, or None when the group isn't mergeable (then callers run
    the layers individually).  Decode launch count is what this buys:
    qkv 3 -> 1 and swiglu gate+up 2 -> 1 at ~4 us/launch."""
    first = layers[0]
    ok = (x.quantized and not x._tp_sharded
          and not first.config.weight_only
          and first.config.weight_bits == 4
          and all(l.is_quantized and not l.quant_fallback
                  and not l.fuse_relu and not l._tp_sharded
                  and "w4_packed" in l.params for l in layers))
    if not ok:
        return None
    from .ops.w4 import w4a8_matmul_multi
    parts = []
    for l in layers:
        parts.append(dict(
            packed=l._p("w4_packed"), scales=l._p("w4_scales"),
            zpb=(jnp.float32(l.zero_point)
                 + l._p("bias") / jnp.float32(l.scale)),
            mult=jnp.float32(x.scale) / jnp.float32(l.scale),
            wsum=l._p("w4_wsum")))
    outs = w4a8_matmul_multi(
        x.data, parts, first.in_channels, first.config.w4_group,
        zp_x=int(x.zero_point), rounding=first.config.rounding,
        backend=first.config.w4_kernel)
    for l, o in zip(layers, outs):
        _record_cost(l, 2 * o.shape[0] * l.in_channels * l.out_channels,
                     x.data.size + o.size
                     + l.in_channels * l.out_channels // 2)
    return tuple(Tensor(o, l.scale, l.zero_point)
                 for l, o in zip(layers, outs))


def fused_linear_act(linear: "Linear", act: "QuantAct", x: Tensor) -> Tensor:
    """Run a converted ``Linear`` -> ``QuantAct`` pair as one GEMM with the
    activation folded into the requant epilogue (ops/gemm_int8.KERNEL_ACTS).

    Drop-in for ``act(linear(x))`` once both layers are quantized: the
    intermediate u8 grid is replayed in-register (bit-identical on the XLA
    backend; +-1 code on the Pallas kernel for erf-gelu, see
    ops/gemm_int8._erf), so calibration transfers unchanged and the
    standalone dequant->fn->requant pass over the Linear output never
    touches HBM.  Models gate on ``QuantConfig.fuse_linear_act``; falls
    back to the composed pair when the pair isn't fusable (custom fn,
    bf16 glue, LUT backend).  Tensor-parallel Linears fuse too: the act
    epilogue is per-output-column with per-tensor act scales, so it is
    exact on a column shard and after a row-parallel psum alike."""
    from .ops.functional import ACTIVATIONS
    fusable = (linear.is_quantized and act.is_quantized
               and x.quantized and not linear.config.weight_only
               and linear.config.weight_bits == 8   # W4A8: composed
               and not linear.quant_fallback
               and act.fn_name in KERNEL_ACTS
               # a custom callable may share a built-in's __name__; only
               # fuse the exact registered fn (the kernel replays KERNEL_ACTS)
               and act.fn is ACTIVATIONS.get(act.fn_name)
               and act.backend == "elementwise"
               and act.config.glue_dtype == "float32"
               # ring-overlap TP consumes shards through ring_qgemm,
               # which has no act epilogue — compose there
               and not (linear._tp_sharded
                        and Layer._overlap_axes() is not None))
    if not fusable:
        return act(linear(x))
    out = linear._forward_int8(
        x, act=(act.fn_name, act.scale, act.zero_point))
    _record_cost(act, out.data.size, 2 * out.data.size)
    return out


def fused_attention(attn: "QuantMatmul", smax: "QuantSoftmax",
                    av: "QuantMatmul", qh: Tensor, kh: Tensor,
                    vh: Tensor) -> Tensor:
    """Run a converted QK^T -> softmax -> P@V chain as one fused op.

    Drop-in for ``av(smax(attn(qh, kh)), vh)`` once all three layers are
    quantized: same calibrated scales, same intermediate u8 grids (see
    ops/attention.py), but the score/probability tensors never touch HBM.
    Models gate on ``QuantConfig.fused_attention``.
    """
    if not (attn.is_quantized and smax.is_quantized and av.is_quantized):
        raise RuntimeError("fused_attention requires converted layers")
    if not attn.transpose_b or av.transpose_b or av.alpha != 1.0 \
            or smax.causal:
        raise ValueError("fused_attention expects attn=QK^T (transpose_b), "
                         "a plain P@V, and non-causal softmax")
    from .ops import attention as attn_ops
    backend = attn.config.fused_attention
    out = attn_ops.attention(
        qh.data, kh.data, vh.data,
        backend="auto" if backend in ("auto", "off") else backend,
        scale_q=qh.scale, zp_q=qh.zero_point,
        scale_k=kh.scale, zp_k=kh.zero_point,
        scale_v=vh.scale, zp_v=vh.zero_point,
        scale_s=attn.scale, zp_s=attn.zero_point,
        scale_p=smax.scale, zp_p=smax.zero_point,
        scale_c=av.scale, zp_c=av.zero_point,
        alpha=attn.alpha, rounding=attn.config.rounding)
    t = qh.data.shape[-2]
    _record_cost(attn, 2 * qh.data.size * t,
                 qh.data.size + kh.data.size)
    _record_cost(av, 2 * out.size * t, vh.data.size + out.size)
    return Tensor(out, av.scale, av.zero_point)


def fused_decode_attention(attn: "QuantMatmul", smax: "QuantSoftmax",
                           av: "QuantMatmul", q2: Tensor, kc: Tensor,
                           vc: Tensor, valid, head_dim: int) -> Tensor:
    """Cached-decode twin of :func:`fused_attention`: one query row
    against the full T-major FLAT KV cache with ``valid`` live positions.

    ``q2`` [B, C] is the un-split query projection row; ``kc``/``vc``
    [B, T, C] are the flat caches (row t = that position's head-merged
    codes).  Semantically ``merge(av(smax(attn(split(q), split(k)),
    valid_len=valid), split(v)))`` after convert(); models gate on
    ``QuantConfig.decode_attention``.  Under head-parallel TP the inputs
    are local channel shards and ``C_local / head_dim`` local heads
    decode independently — exact per head.
    """
    if not (attn.is_quantized and smax.is_quantized and av.is_quantized):
        raise RuntimeError("fused_decode_attention requires converted "
                           "layers")
    if not attn.transpose_b or av.transpose_b or av.alpha != 1.0:
        raise ValueError("fused_decode_attention expects attn=QK^T "
                         "(transpose_b) and a plain P@V")
    from .ops import attention as attn_ops
    backend = attn.config.decode_attention
    n_heads = q2.data.shape[-1] // head_dim      # local under TP
    # GQA (llama family): the kv cache is kv-head-compact — its row
    # width names the kv head count; MHA caches derive n_kv == n_heads
    n_kv = kc.data.shape[-1] // head_dim
    # 'off' = the caller asked for the composed per-layer path: honor it
    # (decode_attention 'xla' IS that composed triple) instead of
    # silently coercing to 'auto' (advisor finding, round 1).
    out = attn_ops.decode_attention_flat(
        q2.data, kc.data, vc.data, valid, n_heads=n_heads,
        n_kv_heads=n_kv,
        backend="xla" if backend == "off" else backend,
        scale_q=q2.scale, zp_q=q2.zero_point,
        scale_k=kc.scale, zp_k=kc.zero_point,
        scale_v=vc.scale, zp_v=vc.zero_point,
        scale_s=attn.scale, zp_s=attn.zero_point,
        scale_p=smax.scale, zp_p=smax.zero_point,
        scale_c=av.scale, zp_c=av.zero_point,
        alpha=attn.alpha, rounding=attn.config.rounding,
        window=getattr(smax, "window", None),
        softcap=getattr(smax, "softcap", None),
        alibi=getattr(smax, "alibi_slopes", None))
    t = kc.data.shape[-2]
    _record_cost(attn, 2 * q2.data.size * t,
                 q2.data.size + kc.data.size)
    _record_cost(av, 2 * out.size * t, vc.data.size + out.size)
    # head-parallel TP: per-(b, h) decode attention is exact on a local
    # head shard — propagate the flag so the row-parallel out-proj
    # consumes the shard directly
    return Tensor(out, av.scale, av.zero_point,
                  _tp_sharded=q2._tp_sharded)


def fused_extend_attention(attn: "QuantMatmul", smax: "QuantSoftmax",
                           av: "QuantMatmul", q3: Tensor, kc: Tensor,
                           vc: Tensor, valid_base, head_dim: int
                           ) -> Tensor:
    """Multi-position twin of :func:`fused_decode_attention`: m query
    rows (positions base..base+m-1) against the T-major FLAT KV cache —
    the speculative-verify / chunked-extend hot path.

    ``q3`` [B, m, C] are the un-split query projection rows (the m new
    positions' codes, already appended to the cache by the caller);
    ``valid_base`` is the FIRST row's live length (pos + 1; scalar or
    [B]) — row j sees ``valid_base + j`` cache columns, which is exactly
    the causal mask over cache + self rows.  Output [B, m, C] codes at
    ``av``'s grid.  Routed through ops/attention.decode_attention_flat's
    multi-position path: the Pallas kernel runs all m*H query rows in
    ONE call (same per-instance overhead as a single decode step — the
    verify amortization that makes speculative decoding pay), the XLA
    fallback is the composed per-row-valid oracle.
    """
    if not (attn.is_quantized and smax.is_quantized and av.is_quantized):
        raise RuntimeError("fused_extend_attention requires converted "
                           "layers")
    if not attn.transpose_b or av.transpose_b or av.alpha != 1.0:
        raise ValueError("fused_extend_attention expects attn=QK^T "
                         "(transpose_b) and a plain P@V")
    from .ops import attention as attn_ops
    backend = attn.config.decode_attention
    n_heads = q3.data.shape[-1] // head_dim      # local under TP
    n_kv = kc.data.shape[-1] // head_dim
    out = attn_ops.decode_attention_flat(
        q3.data, kc.data, vc.data, valid_base, n_heads=n_heads,
        n_kv_heads=n_kv,
        backend="xla" if backend == "off" else backend,
        scale_q=q3.scale, zp_q=q3.zero_point,
        scale_k=kc.scale, zp_k=kc.zero_point,
        scale_v=vc.scale, zp_v=vc.zero_point,
        scale_s=attn.scale, zp_s=attn.zero_point,
        scale_p=smax.scale, zp_p=smax.zero_point,
        scale_c=av.scale, zp_c=av.zero_point,
        alpha=attn.alpha, rounding=attn.config.rounding,
        window=getattr(smax, "window", None),
        softcap=getattr(smax, "softcap", None),
        alibi=getattr(smax, "alibi_slopes", None))
    t = kc.data.shape[-2]
    _record_cost(attn, 2 * q3.data.size * t, q3.data.size + kc.data.size)
    _record_cost(av, 2 * out.size * t, vc.data.size + out.size)
    return Tensor(out, av.scale, av.zero_point,
                  _tp_sharded=q3._tp_sharded)


class QuantLayerNorm(Layer):
    """LayerNorm over the last axis with calibrated u8 output.

    gamma/beta stay FP32 and the normalization runs in f32 on the VPU
    between the int8 GEMMs (standard INT8-transformer practice — the
    per-token mean/variance make an integer-only LN numerically fraught
    for no bandwidth win: in/out stay u8, and XLA fuses the f32 interior).
    The surrounding PTQ lifecycle is the usual one: observe the FP32 LN
    output while preparing; after convert(), dequant -> LN -> requant to
    the calibrated range.
    """

    def __init__(self, dim: int, eps: float = 1e-5,
                 config: QuantConfig = DEFAULT_CONFIG):
        super().__init__(config)
        self.dim = int(dim)
        self.eps = float(eps)
        self.params = {
            "weight": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32),
        }

    def load_weight(self, w):
        self.params["weight"] = self._load_array(w, (self.dim,),
                                                 "load_weight")

    def load_bias(self, b):
        self.params["bias"] = self._load_array(b, (self.dim,), "load_bias")

    def _quantize_weights(self):
        # gamma/beta stay FP32 (see class docstring) — nothing to free.
        pass

    def _ln(self, f):
        mean = jnp.mean(f, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(f - mean), axis=-1, keepdims=True)
        norm = (f - mean) * lax.rsqrt(var + self.eps)
        return norm * self._p("weight") + self._p("bias")

    def __call__(self, x: Tensor) -> Tensor:
        if x.shape[-1] != self.dim:
            raise ValueError(
                f"QuantLayerNorm({self.dim}) got last-dim {x.shape[-1]}")
        if not x.quantized:
            out = self._ln(x.data)
            if self.is_preparing:
                self._observe(out)
            return Tensor(out)
        if not self.is_quantized:
            raise RuntimeError("layer not converted; call convert() first")
        f = quant_ops.dequantize_u8(x.data, x.scale, x.zero_point)
        out = quant_ops.quantize_u8(self._ln(f), self.scale,
                                    self.zero_point, self.config.rounding)
        return Tensor(out, self.scale, self.zero_point)


class QuantRMSNorm(Layer):
    """RMSNorm over the last axis with calibrated u8 output.

    The llama-family normalization (Zhang & Sennrich '19): no mean
    subtraction, no bias — ``y = x * rsqrt(mean(x^2) + eps) * weight``.
    Same INT8 design as QuantLayerNorm: gamma stays FP32, the f32
    interior runs on the VPU between the int8 GEMMs, and the output is
    requantized to this layer's calibrated range.

    ``unit_offset=True`` (gemma family): the stored weight is a DELTA
    around one — ``y = x * rsqrt(mean(x^2) + eps) * (1 + weight)`` —
    matching gemma checkpoints' zero-initialized norm weights.
    """

    def __init__(self, dim: int, eps: float = 1e-6,
                 config: QuantConfig = DEFAULT_CONFIG,
                 unit_offset: bool = False):
        super().__init__(config)
        self.dim = int(dim)
        self.eps = float(eps)
        self.unit_offset = bool(unit_offset)
        init = jnp.zeros if unit_offset else jnp.ones
        self.params = {"weight": init((dim,), jnp.float32)}

    def load_weight(self, w):
        self.params["weight"] = self._load_array(w, (self.dim,),
                                                 "load_weight")

    def _quantize_weights(self):
        # gamma stays FP32 (see class docstring) — nothing to free.
        pass

    def _norm(self, f):
        ms = jnp.mean(jnp.square(f), axis=-1, keepdims=True)
        g = self._p("weight")
        if self.unit_offset:
            g = 1.0 + g
        return f * lax.rsqrt(ms + self.eps) * g

    def __call__(self, x: Tensor) -> Tensor:
        if x.shape[-1] != self.dim:
            raise ValueError(
                f"QuantRMSNorm({self.dim}) got last-dim {x.shape[-1]}")
        if not x.quantized:
            out = self._norm(x.data)
            if self.is_preparing:
                self._observe(out)
            return Tensor(out)
        if not self.is_quantized:
            raise RuntimeError("layer not converted; call convert() first")
        f = quant_ops.dequantize_u8(x.data, x.scale, x.zero_point)
        out = quant_ops.quantize_u8(self._norm(f), self.scale,
                                    self.zero_point, self.config.rounding)
        return Tensor(out, self.scale, self.zero_point)


class QuantRoPE(Layer):
    """Rotary position embedding with calibrated u8 output (ops/rope.py).

    Applied per head to the q / k projections before attention
    (llama-family models); ``start`` offsets the positions exactly like
    QuantPosEmbed(start=) — a traced scalar in generate()'s decode scan,
    or a per-slot [B] vector in the continuous-batching engine.

    INT8 path: dequant -> rotate in f32 -> requant to this layer's
    calibrated (scale, zp).  The rotation is elementwise with angles
    computed from the SAME static inv_freq in prefill and decode, so
    cached k codes are bit-identical whichever path produced them —
    preserving the u8-KV-cache exactness invariant (the k-side QuantRoPE
    defines the cache's quantization grid).  Weight-free: rotation under
    TP head sharding is per-head elementwise, so a local head shard
    rotates exactly.
    """

    def __init__(self, head_dim: int, base: float = 10000.0,
                 config: QuantConfig = DEFAULT_CONFIG, scaling=None,
                 rotary_dim: int | None = None):
        super().__init__(config)
        if head_dim % 2:
            raise ValueError(f"RoPE head_dim must be even, got {head_dim}")
        self.head_dim = int(head_dim)
        self.base = float(base)
        # context-extension scaling ("linear"/"ntk", factor) —
        # ops/rope.rope_angles; static in position, so the cache
        # invariant is untouched
        self.scaling = tuple(scaling) if scaling is not None else None
        # partial rotary (gpt-neox rotary_pct / phi rotary_dim): only
        # the first rotary_dim channels of each head rotate; the rest
        # pass through (and requantize onto this layer's grid like any
        # boundary).  Same half-split pair layout within the rotary
        # slice as HF's rotate_half, so checkpoints load unchanged.
        if rotary_dim is not None:
            rotary_dim = int(rotary_dim)
            if rotary_dim % 2 or not 0 < rotary_dim <= self.head_dim:
                raise ValueError(
                    f"rotary_dim must be even in (0, {self.head_dim}], "
                    f"got {rotary_dim}")
            if rotary_dim == self.head_dim:
                rotary_dim = None
        self.rotary_dim = rotary_dim

    def _quantize_weights(self):  # no weights to quantize
        pass

    def _rotate(self, f, start):
        from .ops.rope import apply_rope, rope_angles
        t = f.shape[-2]
        r = self.rotary_dim or self.head_dim
        pos = jnp.arange(t, dtype=jnp.int32)
        if getattr(start, "ndim", 0) == 1:          # per-slot [B] starts
            pos = start[:, None] + pos              # [B, T]
            cos, sin = rope_angles(pos, r, self.base, self.scaling)
            cos, sin = cos[:, None], sin[:, None]   # [B, 1, T, r/2]
        else:
            pos = start + pos                       # [T]
            cos, sin = rope_angles(pos, r, self.base, self.scaling)
        if self.rotary_dim is None:
            return apply_rope(f, cos, sin)
        return jnp.concatenate(
            [apply_rope(f[..., :r], cos, sin), f[..., r:]], axis=-1)

    def __call__(self, x: Tensor, start=0) -> Tensor:
        if x.shape[-1] != self.head_dim:
            raise ValueError(
                f"QuantRoPE(head_dim={self.head_dim}) got head-split "
                f"last-dim {x.shape[-1]}")
        if not x.quantized:
            out = self._rotate(x.data, start)
            if self.is_preparing:
                self._observe(out)
            return Tensor(out, _tp_sharded=x._tp_sharded)
        if not self.is_quantized:
            raise RuntimeError("layer not converted; call convert() first")
        f = quant_ops.dequantize_u8(x.data, x.scale, x.zero_point)
        out = quant_ops.quantize_u8(self._rotate(f, start), self.scale,
                                    self.zero_point, self.config.rounding)
        return Tensor(out, self.scale, self.zero_point,
                      _tp_sharded=x._tp_sharded)


class QuantMoE(Layer):
    """Mixture-of-experts SwiGLU MLP with top-k routing — ONE layer
    holding all E experts' stacked weights (the mixtral-family MLP).

    TPU-native design decisions (each deliberate, none reference-bound):

    * **Stacked experts, measured dispatch**: expert weights live as
      [E, ...] arrays.  Dense dispatch (every expert computes over
      every token; the router's top-k softmax weights — exact zeros
      elsewhere — combine the results) is the XLA-friendly static form
      and wins at small E; ``dispatch='sparse'`` scans experts with a
      ``lax.cond`` gate so unrouted experts' weight reads are SKIPPED
      at runtime, winning from E=8 up at decode batches ('auto' picks
      by the measured crossover — see ``_use_sparse``).  The [E]
      leading axis IS the expert-parallel sharding axis (role
      'expert': each device holds E/model_size whole experts, computes
      them densely, and ONE psum combines partial outputs).
    * **FP32 router**: the router matmul is [M, K] x [K, E] — tiny —
      and quantizing its logits could FLIP top-k selections, an
      accuracy cliff with no bandwidth payoff.
    * **Dynamic W8A8 experts**: weights are per-expert symmetric s8
      (the memory-bound serving win), activations quantize on the fly
      with per-token symmetric scales into s8 x s8 MXU GEMMs (the
      framework's dynamic_act mode, stacked) — no per-expert
      calibration state.  Only the OUTPUT grid is calibrated: the layer
      observes the combined f32 result while preparing and requantizes
      to its (scale, zero_point) after convert, so the surrounding
      graph sees a normal u8-in/u8-out quantized layer.
    * **Top-k <= 2 expert parallelism is BIT-exact on the INT8 path**:
      the expert inner dots are integer (order-free), each token's f32
      combine has at most two nonzero terms, IEEE addition of two
      values is commutative, and the dense zeros add exactly nothing —
      so the psum of local partials equals the unsharded E-axis
      reduction code for code after requantization (tests/test_moe.py
      pins it at mesh (4, 2)).  The FP32 serving path is allclose only
      (float inner dots may tile differently across program variants —
      the row-parallel Linear contract).
    """

    def __init__(self, dim: int, hidden: int, n_experts: int,
                 top_k: int = 2, config: QuantConfig = DEFAULT_CONFIG,
                 dispatch: str = "auto"):
        super().__init__(config)
        if not 1 <= top_k <= n_experts:
            raise ValueError(f"top_k {top_k} not in [1, {n_experts}]")
        if dispatch not in ("auto", "dense", "sparse"):
            raise ValueError(f"dispatch {dispatch!r} not in "
                             "auto/dense/sparse")
        self.dim, self.hidden = int(dim), int(hidden)
        self.n_experts, self.top_k = int(n_experts), int(top_k)
        self.dispatch = dispatch
        e, h, k = self.n_experts, self.hidden, self.dim
        self.params = {
            "router": jnp.zeros((e, k), jnp.float32),
            "gate_w": jnp.zeros((e, h, k), jnp.float32),
            "up_w": jnp.zeros((e, h, k), jnp.float32),
            "down_w": jnp.zeros((e, k, h), jnp.float32),
        }
        self._tp_expert = False

    def load_router(self, w):
        self.params["router"] = self._load_array(
            w, (self.n_experts, self.dim), "load_router")

    def load_gate_w(self, w):
        self.params["gate_w"] = self._load_array(
            w, (self.n_experts, self.hidden, self.dim), "load_gate_w")

    def load_up_w(self, w):
        self.params["up_w"] = self._load_array(
            w, (self.n_experts, self.hidden, self.dim), "load_up_w")

    def load_down_w(self, w):
        self.params["down_w"] = self._load_array(
            w, (self.n_experts, self.dim, self.hidden), "load_down_w")

    def _quantize_weights(self):
        if self.quant_fallback:
            return                      # FP32 island: weights stay float
        rnd = self.config.rounding
        per_ch = self.config.weight_per_channel
        for nm in ("gate_w", "up_w", "down_w"):
            w = np.asarray(self.params[nm])
            if per_ch:
                # per-expert per-OUTPUT-row scales ([E, H] for gate/up,
                # [E, K] for down — axis 1 is the output row)
                s = np.maximum(np.abs(w).max(axis=2), 1e-12) / 127.0
                q = w / s[:, :, None]
            else:
                s = np.maximum(np.abs(w).max(axis=(1, 2)), 1e-12) / 127.0
                q = w / s[:, None, None]
            q = np.round(q) if rnd == "nearest" else np.trunc(q)
            self.params["q_" + nm] = jnp.asarray(
                np.clip(q, -127, 127).astype(np.int8))
            self.params[nm + "_s"] = jnp.asarray(s.astype(np.float32))
            del self.params[nm]

    def _use_sparse(self, m: int) -> bool:
        """'auto' dispatch rule, pinned by the on-chip E-sweep
        (moe_tiny 768d/12L decode, b8 top-2, one v5e, 2026-08-20):

            E      dense        sparse       winner
            4      0.319 ms     0.621 ms     dense  (1.9x)
            8      0.800        0.754        sparse (+6%)
            16     1.283        1.027        sparse (+25%)

        Exactly the P(expert unread) = (1 - k/E)^M story: at E=4/M=8
        nearly every expert is routed (skip probability 10%) and the
        per-expert scan+cond serialization costs more than it saves; at
        E=16 a third of the expert weights go unread.  Crossover E=8;
        sparse also needs a small batch (prefill M=B*T re-routes every
        expert — dense batches better there)."""
        if self.dispatch != "auto":
            return self.dispatch == "sparse"
        return self.n_experts >= 8 and m <= 16

    def _route(self, f):
        """Top-k routing weights [M, E]: softmax over the selected
        logits, exact zeros elsewhere (ties at the k-th logit keep every
        tied expert — measure-zero on real activations)."""
        logits = jnp.dot(f, self._p("router").T,
                         preferred_element_type=jnp.float32)
        kth = lax.top_k(logits, self.top_k)[0][..., -1:]
        return jax.nn.softmax(
            jnp.where(logits >= kth, logits, -jnp.inf), axis=-1)

    def _experts(self, f, wexp, gate, up, down, gs, us, ds):
        """Dense expert compute + weighted combine -> [M, K] f32.

        ``gate``/``up`` [E, H, K], ``down`` [E, K, H] (s8 or f32 with
        unit scales), scales [E]; ``wexp`` [M, E] routing weights (the
        caller slices the expert axis under EP sharding).

        s8 weights run the dynamic-W8A8 MXU path — EXCEPT in plain
        weight_only mode, whose contract is float activations
        everywhere (error = weight rounding only): there the s8 experts
        dequantize on the fly and compute in f32, like every Linear.
        ``weight_only + dynamic_act`` keeps the dynamic path (that IS
        the dynamic mode).  ``weight_bits=4`` experts stay s8 (the W4
        path is Linear-only by design, like convs)."""
        f32 = jnp.float32
        int8 = gate.dtype == jnp.int8

        def srow(sc):
            # scale per expert ([E] -> [E, 1, 1]) or per expert row
            # ([E, rows] -> [E, rows, 1]); rows = the weight's axis 1
            return sc[:, None, None] if sc.ndim == 1 else sc[:, :, None]

        if int8 and self.config.weight_only and not self.config.dynamic_act:
            gate = gate.astype(f32) * srow(gs)
            up = up.astype(f32) * srow(us)
            down = down.astype(f32) * srow(ds)
            int8 = False
        if int8:
            # dynamic per-token symmetric s8 activations (Linear's
            # dynamic_act convention)
            s_a = jnp.maximum(jnp.max(jnp.abs(f), axis=1, keepdims=True),
                              1e-8) / 127.0
            a = jnp.clip(jnp.round(f / s_a), -127, 127).astype(jnp.int8)
            accg = lax.dot_general(a, gate, (((1,), (2,)), ((), ())),
                                   preferred_element_type=jnp.int32)
            accu = lax.dot_general(a, up, (((1,), (2,)), ((), ())),
                                   preferred_element_type=jnp.int32)
            # [M, E, H] * per-token s_a * weight scale (per expert [E]
            # or per expert-row [E, H])
            gsb = gs[None, :, None] if gs.ndim == 1 else gs[None]
            usb = us[None, :, None] if us.ndim == 1 else us[None]
            g = accg.astype(f32) * s_a[:, :, None] * gsb
            u = accu.astype(f32) * s_a[:, :, None] * usb
        else:
            g = lax.dot_general(f, gate, (((1,), (2,)), ((), ())),
                                preferred_element_type=f32)
            u = lax.dot_general(f, up, (((1,), (2,)), ((), ())),
                                preferred_element_type=f32)
        prod = jax.nn.silu(g) * u                      # [M, E, H]
        if int8:
            s2 = jnp.maximum(jnp.max(jnp.abs(prod), axis=2,
                                     keepdims=True), 1e-8) / 127.0
            p8 = jnp.clip(jnp.round(prod / s2), -127, 127
                          ).astype(jnp.int8)
            accd = lax.dot_general(p8, down, (((2,), (2,)), ((1,), (0,))),
                                   preferred_element_type=jnp.int32)
            # [E, M, K] * per-(token, expert) s2 * down scale (per
            # expert [E] or per expert-row [E, K])
            dsb = ds[:, None, None] if ds.ndim == 1 else ds[:, None, :]
            d = accd.astype(f32) * jnp.transpose(s2, (1, 0, 2)) * dsb
        else:
            d = lax.dot_general(prod, down, (((2,), (2,)), ((1,), (0,))),
                                preferred_element_type=f32)
        # combine: sum_e wexp[m, e] * d[e, m, :] (zeros kill non-top-k)
        return jnp.sum(d * jnp.transpose(wexp)[:, :, None], axis=0)

    def _experts_sparse(self, f, wexp, gate, up, down, gs, us, ds):
        """Sparse dispatch: a lax.scan over experts with a lax.cond per
        expert — UNROUTED experts' branches never execute, so their
        weight HBM reads are skipped at runtime (real control flow, not
        a mask).  This is the decode-batch lever the dense docstring
        names: at batch M with top-k routing, an expert goes unread
        with probability (1 - k/E)^M — negligible at E=4 (dense reads
        win on batching), substantial at E >= 16 (M=8, top-2: ~34% of
        expert weights skipped at E=16, ~60% at E=32).

        Bit-exactness vs dense (INT8 path, any top_k): per-expert math
        is identical (same integer dots, same per-token scales), the
        combine accumulates in the same expert order e = 0..E-1, and
        skipped experts contribute exactly the 0.0 their zero routing
        weight contributes densely.  Pinned in tests/test_moe.py.

        Not used under expert-parallel sharding: EP already slices the
        expert axis across devices (each shard computes its local
        experts densely) and a data-dependent cond inside shard_map
        would desynchronize the psum schedule.
        """
        f32 = jnp.float32
        m, k = f.shape
        int8 = gate.dtype == jnp.int8
        if int8 and self.config.weight_only \
                and not self.config.dynamic_act:
            int8 = False                 # f32 branch dequantizes per use
        if int8:
            s_a = jnp.maximum(jnp.max(jnp.abs(f), axis=1,
                                      keepdims=True), 1e-8) / 127.0
            a = jnp.clip(jnp.round(f / s_a), -127, 127).astype(jnp.int8)
        hit = jnp.any(wexp > 0.0, axis=0)            # [E]

        def one(e):
            ge, ue, de = gate[e], up[e], down[e]
            gse, use, dse = gs[e], us[e], ds[e]   # [] or [rows]
            if int8:
                accg = jnp.dot(a, ge.T, preferred_element_type=jnp.int32)
                accu = jnp.dot(a, ue.T, preferred_element_type=jnp.int32)
                g = accg.astype(f32) * s_a * jnp.atleast_1d(gse)[None, :]
                u = accu.astype(f32) * s_a * jnp.atleast_1d(use)[None, :]
                prod = jax.nn.silu(g) * u
                s2 = jnp.maximum(jnp.max(jnp.abs(prod), axis=1,
                                         keepdims=True), 1e-8) / 127.0
                p8 = jnp.clip(jnp.round(prod / s2), -127, 127
                              ).astype(jnp.int8)
                accd = jnp.dot(p8, de.T, preferred_element_type=jnp.int32)
                return accd.astype(f32) * s2 \
                    * jnp.atleast_1d(dse)[None, :]
            gf = ge.astype(f32) * (gse if gs.ndim == 1
                                   else gse[:, None])
            uf = ue.astype(f32) * (use if us.ndim == 1
                                   else use[:, None])
            df = de.astype(f32) * (dse if ds.ndim == 1
                                   else dse[:, None])
            g = jnp.dot(f, gf.T, preferred_element_type=f32)
            u = jnp.dot(f, uf.T, preferred_element_type=f32)
            return jnp.dot(jax.nn.silu(g) * u, df.T,
                           preferred_element_type=f32)

        def body(acc, e):
            d_e = lax.cond(hit[e], one,
                           lambda _: jnp.zeros((m, k), f32), e)
            return acc + d_e * wexp[:, e][:, None], None

        acc, _ = lax.scan(body, jnp.zeros((m, k), f32),
                          jnp.arange(gate.shape[0]))
        return acc

    def _moe(self, f):
        """Route + experts (+ EP psum) on float input [M, K]."""
        wexp = self._route(f)
        quantized = "q_gate_w" in self._src()
        if quantized:
            gate, up, down = (self._p("q_gate_w"), self._p("q_up_w"),
                              self._p("q_down_w"))
            gs, us, ds = (self._p("gate_w_s"), self._p("up_w_s"),
                          self._p("down_w_s"))
        else:
            gate, up, down = (self._p("gate_w"), self._p("up_w"),
                              self._p("down_w"))
            ones = jnp.ones((gate.shape[0],), jnp.float32)
            gs = us = ds = ones
        pa = self._active_axes() if self._tp_expert else None
        if pa is not None:
            # expert parallel: this shard's [E_local, ...] stacks; slice
            # the matching routing-weight columns and psum the partial
            # combines (bit-exact for top_k <= 2, see class docstring)
            e_local = gate.shape[0]
            idx = lax.axis_index(pa.model_axis)
            w_local = lax.dynamic_slice_in_dim(wexp, idx * e_local,
                                               e_local, 1)
            part = self._experts(f, w_local, gate, up, down, gs, us, ds)
            out = lax.psum(part, pa.model_axis)
        elif self._use_sparse(f.shape[0]):
            out = self._experts_sparse(f, wexp, gate, up, down,
                                       gs, us, ds)
        else:
            out = self._experts(f, wexp, gate, up, down, gs, us, ds)
        _record_cost(self, 2 * 3 * f.shape[0] * self.dim * self.hidden
                     * self.n_experts,
                     f.size * 4 + out.size * 4
                     + 3 * self.n_experts * self.dim * self.hidden)
        return out

    def __call__(self, x: Tensor) -> Tensor:
        if x.shape[-1] != self.dim:
            raise ValueError(
                f"QuantMoE({self.dim}) got last-dim {x.shape[-1]}")
        if not x.quantized:
            out = self._moe(x.data)
            if self.is_preparing:
                self._observe(out)
            return Tensor(out)
        if not self.is_quantized:
            raise RuntimeError("layer not converted; call convert() first")
        f = quant_ops.dequantize_u8(x.data, x.scale, x.zero_point)
        out = self._moe(f)
        codes = quant_ops.quantize_u8(out, self.scale, self.zero_point,
                                      self.config.rounding)
        return Tensor(codes, self.scale, self.zero_point)


class QuantPosEmbed(Layer):
    """Class token + learned positional embedding with calibrated output.

    ViT stem glue: prepends the cls token (held in ``bias`` [C]) to the
    patch tokens [B, T, C] and adds the positional table (held in
    ``weight`` [T+1, C]).  Params stay FP32 (they're tiny and additive);
    the INT8 path dequantizes, adds, and requantizes to the calibrated
    range — one fused VPU pass.

    ``cls=False`` (decoder stem): no class token (``weight`` is
    [num_tokens, C], no ``bias``), the input may be any T <= num_tokens,
    and ``start`` (a traced scalar) offsets the table slice — the
    KV-cache decode path adds position ``start + [0..T)`` embeddings.
    """

    def __init__(self, num_tokens: int, dim: int,
                 config: QuantConfig = DEFAULT_CONFIG, cls: bool = True):
        super().__init__(config)
        self.num_tokens = int(num_tokens)   # patch tokens, excluding cls
        self.dim = int(dim)
        self.cls = cls
        rows = num_tokens + 1 if cls else num_tokens
        self.params = {
            "weight": jnp.zeros((rows, dim), jnp.float32),
        }
        if cls:
            self.params["bias"] = jnp.zeros((dim,), jnp.float32)

    def load_weight(self, w):
        rows = self.num_tokens + 1 if self.cls else self.num_tokens
        self.params["weight"] = self._load_array(
            w, (rows, self.dim), "load_weight")

    def load_bias(self, b):
        if not self.cls:
            raise ValueError("cls=False QuantPosEmbed has no bias")
        self.params["bias"] = self._load_array(b, (self.dim,), "load_bias")

    def _quantize_weights(self):
        # additive FP32 tables stay FP32 (see class docstring).
        pass

    def _apply(self, f, start):
        if self.cls:
            bsz = f.shape[0]
            cls = jnp.broadcast_to(self._p("bias").reshape(1, 1, self.dim),
                                   (bsz, 1, self.dim))
            toks = jnp.concatenate([cls, f], axis=1)
            return toks + self._p("weight")
        if getattr(start, "ndim", 0) == 1:
            # per-row start offsets (continuous-batching decode: each slot
            # sits at its own position)
            idx = start[:, None] + jnp.arange(f.shape[1])
            return f + jnp.take(self._p("weight"), idx, axis=0)
        table = lax.dynamic_slice_in_dim(self._p("weight"),
                                         start, f.shape[1], 0)
        return f + table

    def __call__(self, x: Tensor, start=0) -> Tensor:
        if self.cls:
            if len(x.shape) != 3 or x.shape[1] != self.num_tokens \
                    or x.shape[2] != self.dim:
                raise ValueError(
                    f"QuantPosEmbed expects [B, {self.num_tokens}, "
                    f"{self.dim}] tokens, got {x.shape}")
        elif len(x.shape) != 3 or x.shape[1] > self.num_tokens \
                or x.shape[2] != self.dim:
            raise ValueError(
                f"QuantPosEmbed(cls=False) expects [B, <= "
                f"{self.num_tokens}, {self.dim}] tokens, got {x.shape}")
        if not x.quantized:
            out = self._apply(x.data, start)
            if self.is_preparing:
                self._observe(out)
            return Tensor(out)
        if not self.is_quantized:
            raise RuntimeError("layer not converted; call convert() first")
        f = quant_ops.dequantize_u8(x.data, x.scale, x.zero_point)
        out = quant_ops.quantize_u8(self._apply(f, start), self.scale,
                                    self.zero_point, self.config.rounding)
        return Tensor(out, self.scale, self.zero_point)


class QuantEmbed(Layer):
    """Token embedding with a pre-quantized table — the NLP stem.

    Not in the reference (image-only).  FP32 path gathers the float table
    and observes the output range like any compute layer; ``convert()``
    quantizes the WHOLE table to the calibrated output (scale, zp) once, so
    the INT8 path is a pure u8 row gather — no float work, and the table
    lives in HBM at 1/4 the bytes.  Input is a tensor of integer token ids
    (carried as f32 values; ``Module`` skips input quantization for models
    whose first layer ``consumes_ids``).
    """

    consumes_ids = True

    def __init__(self, vocab_size: int, dim: int,
                 config: QuantConfig = DEFAULT_CONFIG):
        super().__init__(config)
        self.vocab_size = int(vocab_size)
        self.dim = int(dim)
        self.params = {
            "weight": jnp.zeros((vocab_size, dim), jnp.float32),
        }

    def load_weight(self, w):
        self.params["weight"] = self._load_array(
            w, (self.vocab_size, self.dim), "load_weight")

    def load_bias(self, b):
        raise ValueError("QuantEmbed has no bias")

    def convert(self):
        # The whole (static) table is quantized at the calibrated range, so
        # widen the observed range to cover every row — not just the tokens
        # that happened to appear in calibration batches.  Unlike activation
        # ranges, the true population is known for free here; without this,
        # unseen tokens' embeddings would silently clip.
        if self.is_preparing and self.calibrator is not None:
            self.calibrator.sample(self.params["weight"])
        super().convert()

    def _quantize_weights(self):
        if self.config.weight_only:
            # W8-float mode: activations (and hence the gathered embedding
            # rows) stay float.  The table could be stored s8+scale, but
            # its consumer is this very gather, so keep it simple: float.
            return
        self.params = {
            "q_weight": quant_ops.quantize_u8(
                self.params["weight"], self.scale, self.zero_point,
                self.config.rounding),
        }

    def __call__(self, ids: Tensor) -> Tensor:
        if ids.quantized:
            raise ValueError(
                "QuantEmbed consumes raw token ids, not quantized codes")
        # Clamp ids into the table: jnp.take's out-of-range semantics (wrap
        # for negatives, fill for overflows) would otherwise poison the
        # calibrator with NaN / gather garbage codes silently.  Clamping
        # maps bad ids to row 0 / row V-1 deterministically.
        idx = jnp.clip(ids.data.astype(jnp.int32), 0, self.vocab_size - 1)
        if not self.is_quantized or self.config.weight_only:
            out = jnp.take(self._p("weight"), idx, axis=0)
            if self.is_preparing:
                self._observe(out)
            return Tensor(out)
        out = jnp.take(self._p("q_weight"), idx, axis=0)
        return Tensor(out, self.scale, self.zero_point)


class QuantAdd(Layer):
    """Calibrated elementwise add — the residual-connection primitive.

    Not in the reference (its CNNs have no skip connections); required by
    ResNet.  Follows the same PTQ lifecycle as compute layers: while
    preparing, the FP32 sum's range is observed; after convert(), the two
    quantized addends (each at its own (scale, zp)) are dequantized on the
    VPU, summed, and requantized to this layer's calibrated output range —
    the add's analogue of the conv/linear ``down_scale`` boundary.  XLA
    fuses the whole thing into one elementwise kernel.
    """

    def __init__(self, config: QuantConfig = DEFAULT_CONFIG,
                 fuse_relu: bool = False):
        super().__init__(config)
        self.fuse_relu = fuse_relu

    def _quantize_weights(self):  # no weights to quantize
        pass

    @staticmethod
    def _aligned(a: Tensor, b: Tensor):
        """b's data in a's physical layout."""
        if a._nhwc == b._nhwc:
            return b.data
        if a._nhwc:  # b is NCHW
            return jnp.transpose(b.data, (0, 2, 3, 1))
        return jnp.transpose(b.data, (0, 3, 1, 2))

    def __call__(self, a: Tensor, b: Tensor) -> Tensor:
        if a.quantized != b.quantized:
            raise ValueError(
                "QuantAdd: both inputs must be quantized or both float")
        b_data = self._aligned(a, b)
        if not a.quantized:
            out = a.data + b_data
            if self.is_preparing:
                self._observe(out)
            return Tensor(out, _nhwc=a._nhwc)
        if not self.is_quantized:
            raise RuntimeError("layer not converted; call convert() first")
        dt = self._glue_dtype()
        fa = quant_ops.dequantize_u8(a.data, a.scale, a.zero_point, dtype=dt)
        fb = quant_ops.dequantize_u8(b_data, b.scale, b.zero_point, dtype=dt)
        q = quant_ops.quantize_u8(fa + fb, self.scale, self.zero_point,
                                  self.config.rounding)
        if self.fuse_relu:
            q = jnp.maximum(q, jnp.uint8(self.zero_point))
        return Tensor(q, self.scale, self.zero_point, _nhwc=a._nhwc,
                      _tp_sharded=a._tp_sharded)
