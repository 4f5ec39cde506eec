"""Model validation guards: the framework's sanitizer story.

The reference has no sanitizers or overflow guards (SURVEY.md §5 — plain
-O3, crash-on-error); in a functional JAX engine the equivalents are static
invariant checks over the quantized artifact plus a finite-output probe.
``validate`` returns a list of findings (empty = clean) instead of
crashing, so serving can gate model loads on it.
"""

from __future__ import annotations

import numpy as np

from ..tensor import Tensor, tensor


def validate(model, sample_input=None) -> list[str]:
    """Check quantization invariants and (optionally) run a forward probe.

    Static checks per layer: weight codes within s8 range, positive scales,
    zero-points in u8 range, offset/rowsum dtypes.  With ``sample_input``,
    runs the model and checks the output is finite and non-degenerate.
    """
    findings: list[str] = []
    for name, layer in model.named_layers():
        if layer.is_quantized:
            qw = layer.params.get("qw_kn", layer.params.get("qw_hwio"))
            if qw is not None:
                qw_np = np.asarray(qw)
                if qw_np.dtype != np.int8:
                    findings.append(f"{name}: quantized weight dtype "
                                    f"{qw_np.dtype}, expected int8")
                if np.abs(qw_np.astype(np.int32)).max(initial=0) > 127:
                    findings.append(f"{name}: weight code outside [-127,127]")
            scales = np.atleast_1d(np.asarray(layer.weight_scale))
            if not (scales > 0).all() or not np.isfinite(scales).all():
                findings.append(f"{name}: non-positive/non-finite weight "
                                f"scale")
            if not (0 <= layer.zero_point <= 255):
                findings.append(f"{name}: zero_point {layer.zero_point} "
                                f"outside u8 range")
            if layer.scale <= 0 or not np.isfinite(layer.scale):
                findings.append(f"{name}: bad output scale {layer.scale}")
        if layer.is_preparing:
            findings.append(f"{name}: still preparing (convert() not called)")

    if sample_input is not None:
        t = sample_input if isinstance(sample_input, Tensor) else tensor(
            sample_input)
        out = np.asarray(model(t).numpy())
        if not np.isfinite(out).all():
            findings.append("forward probe: non-finite values in output")
        elif out.std() == 0:
            findings.append("forward probe: constant output (degenerate)")
    return findings
