"""Rotary position embeddings (RoPE) — the llama-family position scheme.

Not in the reference (its only model family is CNNs; the framework's
GPT-style decoder uses a learned additive table, models/text_decoder.py).
Llama-family LMs (Touvron et al. '23; Su et al. '21 RoFormer) instead
rotate each head's (q, k) pairs by a position-dependent angle before the
QK^T attention — the relative-position signal then lives in the dot
product itself.

TPU-native design notes:

* The rotation is a pure elementwise VPU map (two muls + add/sub per
  pair) that XLA fuses into the neighbouring dequant/requant glue — no
  table weights to load, no HBM round-trip.
* **Cached-decode bit-exactness** (the framework's u8-KV-cache
  invariant, models/text_decoder.py): position p's angles are computed
  as ``p * inv_freq`` from the SAME static ``inv_freq`` vector in both
  the prefill and the per-step decode path, so the rotated values — and
  therefore the cached u8 codes — are bit-identical whichever path
  computed them.  Everything runs in f32 (glue precision does not apply:
  the rotation feeds the calibrated requant that defines the cache).
* Positions may be a traced scalar start (generate()'s scan carry) or a
  per-slot [B] vector (the continuous-batching engine) — same contract
  as QuantPosEmbed(start=).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rope_angles", "apply_rope"]


def rope_angles(positions, head_dim: int, base: float = 10000.0,
                scaling=None):
    """cos/sin tables for ``positions`` (int32 [T] or [B, T]).

    Returns (cos, sin), each ``positions.shape + (head_dim // 2,)`` f32,
    using the llama/HF frequency layout: pair i = (x[i], x[i + D/2])
    rotated by ``theta_i = pos * base^(-2i/D)``.

    ``scaling`` extends a checkpoint's trained context (the llama-family
    serving levers; both keep the angles a STATIC function of position,
    so the cached-decode bit-exactness invariant is untouched):

    * ``("linear", f)`` — position interpolation (Chen et al. '23):
      positions compress by f, so position p lands where the checkpoint
      trained p/f.
    * ``("ntk", f)`` — NTK-aware base scaling: base' = base *
      f^(D/(D-2)) — high frequencies (local order) barely move, low
      frequencies (long-range decay) stretch by ~f.
    """
    if head_dim % 2:
        raise ValueError(f"RoPE head_dim must be even, got {head_dim}")
    pos = jnp.asarray(positions, jnp.float32)
    if scaling is not None:
        kind, factor = scaling
        factor = float(factor)
        if factor <= 0:
            raise ValueError(f"RoPE scaling factor must be > 0, "
                             f"got {factor}")
        if kind == "linear":
            pos = pos / factor
        elif kind == "ntk":
            base = float(base) * factor ** (head_dim / (head_dim - 2))
        else:
            raise ValueError(
                f"unknown RoPE scaling {kind!r}; use 'linear' or 'ntk'")
    half = head_dim // 2
    inv_freq = jnp.float32(base) ** (
        -jnp.arange(half, dtype=jnp.float32) * (2.0 / head_dim))
    ang = pos[..., None] * inv_freq
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x, cos, sin):
    """Rotate head-split activations ``x`` [..., T, D] (f32).

    ``cos``/``sin`` [..., T, D/2] broadcast against x's leading dims
    (e.g. [T, D/2] against [B, H, T, D], or [B, 1, T, D/2] for per-row
    positions).  Rotate-half convention (llama/HF): the pair is
    (x[..., i], x[..., i + D/2]).
    """
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin,
                            x2 * cos + x1 * sin], axis=-1)
