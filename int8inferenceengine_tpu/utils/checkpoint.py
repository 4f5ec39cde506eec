"""Checkpointing: persist and restore models, including the quantized artifact.

The reference has no native format: it ingests torch ``state_dict`` files and
must rerun ``convert()`` every process, because quantized weights are never
persisted (reference: i8ie/module.py:10-16; src/layer.cc:36-54). Here the
full post-convert state — int8 weights, per-layer output (scale, zero_point),
weight scales — round-trips through one ``.npz`` file, making calibration a
one-time offline step.

Format: a single npz (or, with a ``.safetensors`` path, a safetensors file —
same arrays, meta in the header's metadata dict) with
  * ``__meta__``        — JSON: format version, quantized flag, per-layer
                          quantization metadata,
  * ``<layer>/<param>`` — one array per layer param (fp32 arrays pre-convert,
                          int8/int32 arrays post-convert).

Works for FP32 (pre-convert) models too, so it doubles as the framework's
native state_dict format alongside torch-state-dict ingestion;
``read_state_dict`` ingests flat ``name.weight`` dicts from .pt / .npz /
.safetensors files for ``Module.load``.
"""

from __future__ import annotations

import io
import json

import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1


def state_dict(model) -> dict:
    """Flat {\"layer.param\": np.ndarray} view of all layer params."""
    out = {}
    for name, layer in model.named_layers():
        for k, v in layer.params.items():
            out[f"{name}.{k}"] = np.asarray(v)
    return out


def save(model, path: str) -> None:
    """Save a model (FP32 or quantized) to ``path`` (.npz or .safetensors)."""
    arrays = {}
    meta = {
        "format_version": FORMAT_VERSION,
        "is_quant": bool(model.is_quant),
        "layers": {},
    }
    for name, layer in model.named_layers():
        meta["layers"][name] = {
            "type": type(layer).__name__,
            "is_quantized": layer.is_quantized,
            "scale": layer.scale,
            "zero_point": layer.zero_point,
            "weight_scale": _jsonable(layer.weight_scale),
            "params": sorted(layer.params),
        }
        for k, v in layer.params.items():
            arrays[f"{name}/{k}"] = np.asarray(v)
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import save_file
        save_file({k: np.ascontiguousarray(v) for k, v in arrays.items()},
                  path, metadata={"i8ie_meta": json.dumps(meta)})
        return
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load(model, path: str):
    """Restore ``model`` (architecture must match) from ``path``.

    Returns the model. If the checkpoint is quantized, the model comes back
    ready for INT8 inference — no prepare/convert needed. The format is
    chosen by extension (.safetensors, else npz).
    """
    if str(path).endswith(".safetensors"):
        import safetensors
        with safetensors.safe_open(path, framework="numpy") as f:
            md = f.metadata()
            if not md or "i8ie_meta" not in md:
                raise ValueError(
                    f"{path} is not an i8ie checkpoint (no 'i8ie_meta' "
                    "header) — for a plain safetensors state_dict use "
                    "read_state_dict() + Module.load()")
            meta = json.loads(md["i8ie_meta"])
            arrays = {k: f.get_tensor(k) for k in f.keys()}
    else:
        with np.load(path) as z:
            meta = json.loads(bytes(z["__meta__"]).decode())
            arrays = {k: z[k] for k in z.files if k != "__meta__"}
    if meta.get("format_version", 0) > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format v{meta['format_version']} is newer than "
            f"supported v{FORMAT_VERSION}")
    layers = dict(model.named_layers())
    if set(layers) != set(meta["layers"]):
        raise ValueError(
            f"architecture mismatch: checkpoint layers "
            f"{sorted(meta['layers'])} != model layers {sorted(layers)}")
    for name, info in meta["layers"].items():
        layer = layers[name]
        if type(layer).__name__ != info["type"]:
            raise ValueError(
                f"layer {name!r}: checkpoint has {info['type']}, model "
                f"has {type(layer).__name__}")
        layer.params = {
            k: jnp.asarray(arrays[f"{name}/{k}"]) for k in info["params"]
        }
        layer.scale = info["scale"]
        layer.zero_point = info["zero_point"]
        ws = info["weight_scale"]
        layer.weight_scale = (
            jnp.asarray(np.float32(ws)) if isinstance(ws, list) else ws)
        layer.is_quantized = info["is_quantized"]
        layer.is_preparing = False
        layer.calibrator = None
    model.is_quant = meta["is_quant"]
    model._jit_fn = None
    return model


def read_state_dict(path: str) -> dict:
    """Read a flat ``name.weight``/``name.bias`` state dict for
    ``Module.load`` from a .pt (torch), .npz, or .safetensors file —
    the reference only ever ingests in-memory torch state_dicts
    (i8ie/module.py:10-16; notebooks ``torch.load``)."""
    p = str(path)
    if p.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(p)
    if p.endswith(".npz"):
        with np.load(p) as z:
            return {k: z[k] for k in z.files}
    if p.endswith((".pt", ".pth")):
        import torch
        sd = torch.load(p, map_location="cpu", weights_only=True)
        return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in sd.items()}
    raise ValueError(
        f"read_state_dict: unsupported extension on {path!r} — "
        "expected .pt/.pth (torch), .npz, or .safetensors")


def _jsonable(x):
    if isinstance(x, (int, float)):
        return x
    return np.asarray(x).tolist()  # per-channel weight scales
