"""Framework-wide configuration.

The reference engine hardcodes every hyperparameter (reference:
include/calibrator.h:4 reservoir size, src/layer.cc:44 quantile=1,
i8ie/module.py:20 input quant (0.025, 127)).  We keep those exact values as
zero-config defaults but surface them in one small dataclass.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Post-training static quantization configuration.

    Defaults reproduce the reference engine's hardcoded behavior:
    per-tensor asymmetric u8 activations, per-tensor symmetric s8 weights
    with a single joint weight+bias scale, truncating (round-toward-zero)
    float->int conversions, and requantization to each layer's calibrated
    output (scale, zero_point) at every layer boundary.
    """

    # Input quantization applied by Module.__call__ after convert()
    # (reference: i8ie/module.py:20).
    input_scale: float = 0.025
    input_zero_point: int = 127

    # Calibration (reference: include/calibrator.h:4, src/layer.cc:44).
    # Calibration objective: 'minmax' (reference semantics, default) or
    # 'mse' — grid-search the clip range minimizing reconstruction MSE over
    # the reservoir samples (TensorRT-style; clips heavy-tailed outliers
    # instead of wasting the 8-bit grid on them).  'mse' calibrates eagerly
    # (needs raw samples on the host).
    calib_method: str = "minmax"
    calib_quantile: float = 1.0
    calib_reservoir_size: int = 1000
    # True  -> exact streaming min/max over every observed activation
    #          (deterministic; a strict improvement over the reference's
    #          1000-sample random reservoir, which it approximates at
    #          quantile=1.0).
    # False -> reference-style random reservoir (needed for quantile < 1).
    calib_exact_minmax: bool = True

    # Weight quantization: per-tensor symmetric s8 with one scale shared by
    # weight and bias, scale = (max-min)/127 over their joint range
    # (reference: src/layer.cc:6-26).  per_channel is a TPU-side extension
    # (per-output-channel weight scales) used by deeper models (ResNet).
    weight_per_channel: bool = False

    # Float->int conversion mode.  'trunc' (default) reproduces the
    # reference's C-cast round-toward-zero everywhere (quantize_utils.cc) —
    # which systematically biases every quantization step by -s/2 on
    # average.  'nearest' rounds to the nearest code at input quantization,
    # weight quantization, and every requant epilogue, removing that bias
    # (the measured common-mode shift on a Linear layer was -s_c/2 per
    # output exactly as predicted).
    #
    # DEPTH FOOTGUN (measured, decided round 3): the -s/2 bias COMPOUNDS
    # across serial requant boundaries — depth-8 decoder loses ~5 pts
    # under 'trunc' vs -0.6 under 'nearest' (tests/test_accuracy_synthetic
    # .py); the llama stack (~2x boundaries/block) shows 4x the logit rms
    # error (tests/test_llama.py).  The default stays 'trunc' for
    # reference bit-parity (all parity models are <= 8 boundaries, where
    # the bias is negligible); Module.convert() emits a TruncDepthWarning
    # advisory when a model deeper than 32 boundaries converts under
    # plain 'trunc' with no accuracy lever engaged.
    rounding: str = "trunc"

    # Bias correction (Nagel et al., ICCV'19 "Data-Free Quantization"):
    # during calibration each Linear / ungrouped Conv2d also observes its
    # per-input-channel activation mean; convert() folds the expected
    # weight-quantization error  E[(W - s_w*W_q) x] = (W - s_w*W_q) E[x]
    # into the bias before quantizing it.  Removes the systematic output
    # shift of per-tensor weight scales at zero runtime cost.
    bias_correction: bool = False

    # INT8 conv lowering:
    #   'auto'       -> XLA native s8 conv (implicit im2col on the MXU)
    #   'xla_conv'   -> force the native integer convolution
    #   'gemm'       -> batched im2col + the shared Pallas/XLA quantized GEMM
    conv_backend: str = "auto"

    # Kernel backend selection for the quantized GEMM:
    #   'auto'   -> Pallas on TPU, XLA dot_general fallback elsewhere
    #   'pallas' -> force the Pallas MXU kernel
    #   'xla'    -> force the jnp/dot_general reference path
    kernel_backend: str = "auto"

    # Weight-only quantization (the LLM-serving W8 mode): weights are
    # stored s8 (4x less HBM traffic — what memory-bound decode is bound
    # by) but activations stay float end to end: no input quantization, no
    # calibration needed, no requant glue, accuracy limited only by weight
    # rounding.  Linear/Conv2d dequantize weights on the fly (XLA fuses
    # the upcast into the dot/conv); every other layer runs its float path.
    weight_only: bool = False

    # Weight bit width for weight_only mode: 8 (s8, default) or 4 —
    # W4 grouped weight-only (ops/w4.py): packed nibbles with one symmetric
    # scale per ``w4_group`` input channels.  Linear layers only; Conv2d
    # stays W8 (the W4 use case is LLM serving, which is Linear-bound).
    #
    # WHEN W4A8 PAYS (weight_bits=4 on the static path; the round-4
    # VERDICT asked for this decision table — all rows one v5e, b8
    # decode, 768d/12L, ms/step):
    #
    #   mode            llama(GQA,swiglu)   gpt2(MHA,gelu)   weight MB
    #   W8A8 static     0.151-0.163         0.373-0.377      88 / 131
    #   W8 weight-only  0.448               1.87             88 / 131
    #   W4A8 g=256      0.433-0.436         0.617            44 / 66
    #
    # Decision rule: W4A8 is the CAPACITY mode, not the speed mode.
    #   * Pick it to halve weight HBM (fit a 2x larger model per chip,
    #     or double the weight-cache headroom) — task-quality cost is
    #     ~1% ppl on the trained-twin harness (examples/accuracy_lm.py:
    #     3.143 vs 3.113 FP32 at g=128; g=256 is accuracy-neutral and
    #     ~5% faster).
    #   * Against W8 WEIGHT-ONLY it also wins outright on wall clock
    #     (llama 0.436 vs 0.448, gpt2 0.617 vs 1.87) — half the bytes
    #     feed the MXU as packed nibbles instead of a dequant pass.
    #   * Against W8A8 STATIC it never wins on speed alone: the 3
    #     block-diagonal dots + per-group scale epilogue cost more MXU
    #     issue than the byte saving returns at these geometries (gpt2
    #     pays 1.65x).  llama's 0.436-vs-0.151 gap is the same story at
    #     a smaller multiple (more of its step is non-GEMM).
    #   * Non-shardable (guard in parallel/sharding.py): TP row-partial
    #     float psums would break exactness.  Shard W8A8, or serve W4A8
    #     on one chip.
    # There is deliberately no 'auto' between W8A8 and W4A8: the choice
    # is a capacity-vs-speed tradeoff only the deployment knows.
    weight_bits: int = 8
    w4_group: int = 128
    # MSE-optimal per-group W4 scales (ops/w4.pack_w4(optimize=True)):
    # grid-search each group's clip instead of max/7 — at 4 bits this
    # genuinely cuts reconstruction error (unlike 8-bit, where minmax is
    # near-optimal).
    w4_mse_scales: bool = True
    # W4 matmul backend: 'auto' = the VMEM-unpacking Pallas kernel on TPU
    # (measured 2026-08-19, v5e, gpt2-small b8 decode: 1.996 ms/step vs
    # 5.193 through XLA, which re-materializes the unpacked weights in
    # HBM inside the scan), XLA elsewhere / for shapes the kernel
    # doesn't take.  'pallas' / 'xla' force.
    w4_kernel: str = "auto"

    # Dynamic activation quantization (requires weight_only=True): each
    # Linear/Conv2d quantizes its float input on the fly with a symmetric
    # per-tensor s8 scale (max|x|/127, computed on device per batch) and
    # runs the s8 x s8 MXU GEMM, dequantizing the s32 accumulator back to
    # float.  No calibration, no zero-point corrections; the dynamic range
    # always fits the live batch (torch's "dynamic quantization" mode,
    # TPU-native).  Glue stays float like plain weight_only.
    dynamic_act: bool = False

    # Fuse a Linear's following QuantAct into the GEMM requant epilogue
    # (layers.fused_linear_act / ops/gemm_int8.KERNEL_ACTS): the
    # intermediate u8 grid is replayed in-register instead of a standalone
    # dequant->fn->requant HBM pass over the GEMM output.
    fuse_linear_act: bool = True

    # Merged QKV projection (ops/gemm_int8.qgemm_multi): run the three
    # attention projections sharing one input as ONE GEMM over
    # [K, Nq+Nk+Nv] with a per-column zero-point epilogue.  Bit-identical
    # to the separate calls (decode tokens verified identical on-chip).
    # Measured A/B (2026-08-19, v5e, gpt2-small-ish b8 decode):
    # off 0.828 ms/step, 'auto' (merged XLA at decode shapes) 0.791,
    # merged Pallas 0.875 — so the default is 'auto'.
    # 'off' / 'auto' / 'pallas' / 'xla'.
    fuse_qkv: str = "auto"

    # Fused INT8 attention (ops/attention.py): run the converted
    # QK^T -> softmax -> P@V chain through one op with intermediate
    # quantization replayed bit-compatibly.
    #   'auto'   -> measured best (composed XLA: beat the since-deleted
    #               prefill Pallas kernel at every shape — ViT-Tiny
    #               0.063 vs 0.153 ms/op, GPT-ish 0.074 vs 0.502;
    #               model-level 8,306 vs 7,576 img/s)
    #   'xla'    -> force the composed path through the fused wrapper
    #   'off'    -> per-layer composed path (QuantMatmul/QuantSoftmax)
    # ('pallas' raises: the losing kernel was removed in round 2.  The
    # cached-DECODE kernel below is separate and wins.)
    fused_attention: str = "auto"

    # Cached-decode attention (ops/attention.decode_attention): the M=1
    # query against the full static KV cache inside generate()'s scan.
    #   'auto'   -> Pallas kernel on TPU (the composed path's in-scan XLA
    #               lowering widens the whole cache to i32 in a kLoop
    #               fusion laid out for the cache WRITE — measured 240us
    #               per layer per step vs the kernel's MXU dots), XLA
    #               composed elsewhere
    #   'pallas' / 'xla' -> force; 'off' -> per-layer composed path
    decode_attention: str = "auto"

    # Computation dtype for the FP32 (pre-convert) path. float32 matches the
    # reference oracle; bfloat16 doubles MXU throughput at slight accuracy
    # cost.
    fp_dtype: str = "float32"

    # Requantization-epilogue compute dtype for the INT8 conv path.
    # 'float32' reproduces the reference's down_scale float order exactly;
    # 'bfloat16' halves the epilogue's VPU cost on large conv outputs at the
    # price of occasional +-1 output codes (see ops/quant.down_scale).
    epilogue_dtype: str = "float32"

    # Compute dtype for the calibrated *pointwise glue* between layers —
    # QuantAct / QuantAdd / QuantMul / QuantConcat dequant->op->requant
    # interiors.  These dominate the INT8 runtime of depthwise/SE-heavy
    # families (MobileNetV2/V3, EfficientNet), which are VPU-bound, not
    # MXU-bound.  'bfloat16' halves their VPU cost at the price of
    # occasional +-1 output codes.  Reduction-based glue (LayerNorm,
    # softmax) always keeps f32 interiors regardless.
    #
    # Measured (one v5e, 2026-08-17): EfficientNet-B0 +20% img/s
    # (11.5k -> 13.8k), MobileNetV3-L +1.5%, ViT-Tiny -13% (its glue is
    # LN/softmax-bound, which stays f32 anyway — the bf16 casts just add
    # work).  The default stays 'float32' because it is bit-identical to
    # the composed f32 reference semantics on every model; flip to
    # 'bfloat16' for SE/depthwise families where the +20% applies.
    glue_dtype: str = "float32"


DEFAULT_CONFIG = QuantConfig()
