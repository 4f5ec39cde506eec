"""Module: the model container and PTQ lifecycle driver.

Re-design of the reference's Python ``Module`` (reference: i8ie/module.py).
Users subclass, declare layers in ``__init__``, and write ``forward`` — the
familiar torch-flavored surface:

    class MyNet(Module):
        def __init__(self):
            super().__init__()
            self.fc1 = Linear(784, 10)
        def forward(self, x):
            return self.fc1(x)

Lifecycle (identical to the reference): ``load(state_dict)`` ->
``prepare()`` -> run FP32 batches to calibrate -> ``convert()`` -> quantized
inference.  After convert, ``__call__`` quantizes the input at the configured
(scale, zero_point) — default (0.025, 127), the reference's hardcoded values
(i8ie/module.py:20) — and dequantizes the output.

TPU-native execution model: outside calibration, ``__call__`` traces the
user's whole ``forward`` into ONE jitted XLA program with the layer params
passed as a pytree argument.  That single program holds every quantized GEMM/
conv plus all requant epilogues; XLA fuses the elementwise glue and cancels
layout transposes between layers.  Params-as-arguments (rather than baked
constants) is what lets ``shard()`` later place channel-sharded weights on a
device mesh without retracing the user code.

During ``prepare()`` the forward runs eagerly so the stateful calibrators can
observe activations (the reference samples inside the C++ forward,
fully_connected.cc:18-20).
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from .config import DEFAULT_CONFIG, QuantConfig
from .layers import Layer
from .ops import functional as F
from .tensor import Tensor, _maybe_torch


class TruncDepthWarning(UserWarning):
    """Advisory: deep model converted under 'trunc' rounding with no
    accuracy lever engaged (see Module._warn_trunc_depth)."""


class Module:
    def __init__(self, config: QuantConfig = DEFAULT_CONFIG):
        self.is_quant = False
        self.config = config
        self._jit_fn = None
        self._jit_q_cache = {}   # jitted forwards for pre-quantized inputs
        self._calib_fn = None
        self._calib_meta = {}
        self._mesh = None
        self._shardings = None

    # -- layer discovery -----------------------------------------------------
    def named_layers(self, prefix: str = ""):
        """Yield (dotted_name, layer) for all Layer attrs, recursively.

        The reference scans only the flat ``__dict__`` (i8ie/module.py:26-35);
        recursing into sub-Modules is a compatible superset.
        """
        for name, val in vars(self).items():
            if isinstance(val, Layer):
                yield prefix + name, val
            elif isinstance(val, Module):
                yield from val.named_layers(prefix + name + ".")

    # -- reference lifecycle API ----------------------------------------------
    def load(self, state_dict):
        """Ingest a torch-style flat state_dict ('name.weight'/'name.bias').

        Reference: i8ie/module.py:10-16 (single-dot keys only); dotted paths
        into sub-Modules are also supported here.  HF-exported llama/gpt2
        checkpoints (``model.layers.0.self_attn.q_proj.weight``, gpt2's
        transposed Conv1D + fused ``c_attn``, tied embeddings) are
        detected and translated automatically (utils/hf.py).
        """
        from .utils.hf import maybe_from_hf
        state_dict = maybe_from_hf(state_dict, self)
        for key, value in state_dict.items():
            path, attr = key.rsplit(".", 1)
            obj = self
            for part in path.split("."):
                obj = getattr(obj, part)
            if attr == "weight":
                obj.load_weight(_maybe_torch(value))
            elif attr == "bias":
                obj.load_bias(_maybe_torch(value))
            elif hasattr(obj, "load_" + attr):
                # multi-param layers (QuantMoE: router / gate_w / up_w /
                # down_w) expose load_<param> setters
                getattr(obj, "load_" + attr)(_maybe_torch(value))
            else:
                raise KeyError(f"unrecognized state_dict key: {key}")
        self._jit_fn = None
        self._jit_q_cache = {}

    def prepare(self):
        for _, layer in self.named_layers():
            layer.prepare()
        self._jit_fn = None
        self._jit_q_cache = {}
        self._calib_fn = None
        self._calib_meta = {}

    def convert(self, skip=()):
        """PTQ-convert every layer.  ``skip``: layer names to keep as FP32
        fallback islands — they stay u8-in/u8-out (dequant -> FP32 compute
        -> requant at their calibrated range) so the rest of the graph is
        unaffected, but their weights and arithmetic stay float.  The
        standard mixed-precision lever for quantization-sensitive layers
        (stems / heads / outlier blocks)."""
        from .layers import Conv2d, Linear
        by_name = dict(self.named_layers())
        unknown = set(skip) - set(by_name)
        if unknown:
            raise KeyError(f"convert(skip=...): unknown layers {unknown}")
        unsupported = {n for n in skip
                       if not isinstance(by_name[n], (Linear, Conv2d))}
        if unsupported:
            raise TypeError(
                f"convert(skip=...): FP32 fallback islands are implemented "
                f"for Linear/Conv2d only; {sorted(unsupported)} are "
                f"{[type(by_name[n]).__name__ for n in sorted(unsupported)]}")
        self._warn_trunc_depth(by_name, skip)
        for name, layer in self.named_layers():
            if name in skip:
                layer.quant_fallback = True
            layer.convert()
        self.is_quant = True
        self._jit_fn = None
        self._jit_q_cache = {}
        if self._mesh is not None:
            # shard() was called pre-convert (FP32 serving -> calibrate ->
            # convert): convert() rebuilt every layer's params on the host,
            # so re-place the quantized artifact on the mesh — otherwise
            # execution would silently fall back to unsharded.
            pa = self._parallel_axes
            self.shard(self._mesh, data_axis=pa.data_axis,
                       model_axis=pa.model_axis, overlap=pa.overlap)

    # Deepest reference-parity model is AlexNet (8 boundaries); the
    # measured footgun starts well past that (depth-8 decoder ~= 122
    # boundaries loses ~5 pts under 'trunc', -0.6 under 'nearest';
    # llama_tiny's 39 quadruple its logit rms error —
    # tests/test_accuracy_synthetic.py, tests/test_llama.py).
    TRUNC_DEPTH_ADVISORY = 32

    def _warn_trunc_depth(self, by_name, skip):
        """Advisory for the measured deep-model 'trunc' footgun.

        Every requant boundary under the default round-toward-zero
        conversion ('trunc', reference C-cast parity) carries a -s/2 DC
        bias; across many serial boundaries the bias COMPOUNDS (depth-8
        decoder study: ~5 pt accuracy loss vs -0.6 with 'nearest';
        llama stack: 4x logit rms error).  Reference-parity models are
        shallow (<= 8 boundaries) and unaffected — so converting a deep
        model with 'trunc' and no accuracy lever engaged earns a
        warning, not silence.  Suppressed by any engaged lever
        (rounding='nearest', bias_correction, weight_per_channel,
        calib_method='mse', weight_only) or a mixed-precision skip set.
        """
        cfg = self.config
        if cfg.rounding != "trunc" or skip:
            return
        if (cfg.bias_correction or cfg.weight_per_channel
                or cfg.calib_method == "mse" or cfg.weight_only):
            return
        n = len(by_name)
        if n > self.TRUNC_DEPTH_ADVISORY:
            warnings.warn(
                f"converting {n} quantized layer boundaries with "
                f"rounding='trunc' (the reference-parity default): the "
                f"per-boundary -scale/2 truncation bias compounds with "
                f"depth (measured: ~5 pt accuracy loss at depth 8, 4x "
                f"logit error on the llama stack).  For deep models not "
                f"bound to reference bit-parity, pass "
                f"QuantConfig(rounding='nearest') or engage another "
                f"accuracy lever (bias_correction, weight_per_channel, "
                f"calib_method='mse').", TruncDepthWarning, stacklevel=3)

    def ingest_descriptor(self):
        """Host-ingest pre-layout tag for this model's input, or None.

        Inspects the first declared compute layer (declaration order =
        forward order for standard models): a strided small-channel first
        Conv2d yields its space-to-depth tag (layers.Conv2d.ingest_descriptor)
        that DataLoader(..., layout_for=model) uses to pre-lay-out quantized
        batches on the host.
        """
        from .layers import Conv2d, Linear
        for _, layer in self.named_layers():
            if isinstance(layer, Conv2d):
                return layer.ingest_descriptor()
            if isinstance(layer, Linear):
                return None
        return None

    # -- execution -------------------------------------------------------------
    def forward(self, x: Tensor) -> Tensor:  # overridden by the user
        raise NotImplementedError

    def tp_roles(self, model_size: int) -> dict:
        """Per-layer tensor-parallel roles for ``shard()`` (overridden by
        transformer models): layer name -> 'col' (output-channel sharded,
        output gathered — the default for every unlisted layer),
        'col_local' (column-parallel, output STAYS sharded for a sharded
        consumer), or 'row' (row-parallel: input-channel sharded, partial
        s32 accumulators psummed before one requant).  See
        parallel/sharding.py."""
        return {}

    def _consumes_ids(self) -> bool:
        """True when the model's stem takes raw token ids
        (layers.QuantEmbed) — input quantization must be skipped.
        Declaration order is not forward order, so ANY id-consuming layer
        marks the model (a model can't mix id and image inputs)."""
        return any(getattr(layer, "consumes_ids", False)
                   for _, layer in self.named_layers())

    def _run(self, t: Tensor) -> Tensor:
        if self.config.weight_only:
            # W8-float mode: activations stay float end to end — no input
            # quantization, nothing to dequantize at the output.
            return self.forward(t)
        if self.is_quant and not t.quantized and not self._consumes_ids():
            # Reference behavior: quantize at the configured input
            # (scale, zp) (i8ie/module.py:20).  Already-quantized input
            # (e.g. DataLoader host-side u8 ingest) passes through at its
            # own scale; raw token ids pass through untouched.
            t = F.quantize(t, self.config.input_scale,
                           self.config.input_zero_point,
                           self.config.rounding)
        out = self.forward(t)
        if self.is_quant:
            out = F.dequantize(out)
        return out

    def _preparing(self) -> bool:
        return any(l.is_preparing for _, l in self.named_layers())

    def _gather_params(self):
        return {name: layer.params for name, layer in self.named_layers()}

    def _bind(self, params, merge: bool = False):
        """Bind traced params for this thread/context (layers._BOUND).

        Per-context, not a layer attribute: concurrent traces of the same
        model in different threads (serving engines) must not see each
        other's tracers.  ``merge=True`` adds this module's layers to an
        existing binding instead of replacing it — programs that trace
        TWO models at once (speculative decoding: target + draft) bind
        the target, then merge the draft."""
        from .layers import _BOUND
        if params is None:
            _BOUND.set(None)
            return
        bound = {id(layer): params[name]
                 for name, layer in self.named_layers()}
        prev = _BOUND.get() if merge else None
        _BOUND.set({**prev, **bound} if prev else bound)

    def __call__(self, x):
        t = x if isinstance(x, Tensor) else Tensor(jnp.asarray(
            _maybe_torch(x), dtype=jnp.float32))
        if t.quantized:
            if self._preparing():
                raise ValueError(
                    "calibration observes FP32 activation ranges — feed "
                    "float input while preparing, not a quantized tensor")
            return self._call_quantized(t)
        if self._preparing():
            if self.config.calib_exact_minmax \
                    and self.config.calib_method == "minmax":
                return self._calibrate_jit(t)
            # Reservoir/quantile mode needs raw activation values on the
            # host, so the calibration forward runs eagerly.
            return self._run(t)
        if self._jit_fn is None:
            def _fwd(params, data):
                self._bind(params)
                try:
                    out = self._run(Tensor(data))
                    return out.logical_data
                finally:
                    self._bind(None)

            in_shardings = (self._shardings, None) if self._shardings else None
            if in_shardings:
                self._jit_fn = jax.jit(_fwd, in_shardings=in_shardings)
            else:
                self._jit_fn = jax.jit(_fwd)
        out = self._jit_fn(self._gather_params(), t.data)
        return Tensor(out)

    def _call_quantized(self, t: Tensor) -> Tensor:
        """Forward for a pre-quantized u8 input (DataLoader host-side
        ingest): skips the Module's input quantization and runs at the
        tensor's own (scale, zp), which specializes the trace."""
        key = (round(t.scale, 12), t.zero_point, t._ingest)
        fn = self._jit_q_cache.get(key)
        if fn is None:
            scale, zp, ingest = t.scale, t.zero_point, t._ingest
            if self._mesh is not None:
                from .parallel.sharding import sharded_forward
                fn = jax.jit(sharded_forward(self, scale, zp, ingest))
            else:
                def _fwd_q(params, data):
                    self._bind(params)
                    try:
                        out = self._run(Tensor(data, scale, zp,
                                               _ingest=ingest))
                        return out.logical_data
                    finally:
                        self._bind(None)

                fn = jax.jit(_fwd_q)
            self._jit_q_cache[key] = fn
        return Tensor(fn(self._gather_params(), t.data))

    def _calibrate_jit(self, t: Tensor) -> Tensor:
        """Calibration forward as ONE jitted XLA program.

        The reference observes activations statefully inside each layer's
        forward (fully_connected.cc:18-20) — impossible under jit.  Instead
        the traced forward emits every preparing layer's (min, max) as extra
        program outputs (via layers._CALIB_SINK); the host then merges them
        into the calibrators.  One compile per input shape, instead of one
        dispatch per op.  Requires exact-minmax mode (the default).
        """
        from .layers import _CALIB_SINK

        shape = tuple(t.data.shape)
        if self._calib_fn is None:
            def _fwd(params, data):
                self._bind(params)
                sink = []
                token = _CALIB_SINK.set(sink)
                try:
                    out = self._run(Tensor(data))
                finally:
                    _CALIB_SINK.reset(token)
                    self._bind(None)
                # Trace-time metadata: which layer produced each record and
                # its kind/count (static per input shape); payload arrays
                # ("range" -> lo, hi scalars; "in_mean" -> mean vector)
                # become extra program outputs.
                self._calib_meta[tuple(data.shape)] = [
                    (rec[0], rec[1], rec[-1]) for rec in sink]
                vals = []
                for rec in sink:
                    vals.extend(rec[2:-1])
                return out.logical_data, vals

            self._calib_fn = jax.jit(_fwd)
        out, vals = self._calib_fn(self._gather_params(), t.data)
        it = iter(vals)
        for layer, kind, count in self._calib_meta[shape]:
            if kind == "range":
                layer.calibrator.observe_minmax(next(it), next(it), count)
            elif kind == "in_mean":
                layer._merge_in_mean(np.asarray(next(it)), count)
        return Tensor(out)

    # -- scale-out --------------------------------------------------------------
    def shard(self, mesh, data_axis: str = "data", model_axis: str = "model",
              overlap: bool = False):
        """Shard layer params over a device mesh (weights by output channel,
        per the TP design in parallel/sharding.py) and compile the forward
        with those shardings.  ``overlap=True`` enables ring tensor
        parallelism for Linear chains (collectives hidden behind partial
        GEMMs).  See parallel/ for details."""
        from .parallel.sharding import shard_module
        shard_module(self, mesh, data_axis=data_axis, model_axis=model_axis,
                     overlap=overlap)
        return self
