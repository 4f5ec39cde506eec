"""Ring tensor-parallel quantized GEMM: overlap collectives with MXU work.

The baseline TP design (parallel/sharding.py) all-gathers each layer's
channel-sharded output before the next layer consumes it — one blocking
collective per layer boundary.  This module provides the overlapped
alternative (SURVEY.md §7 step 5: "shard_map variants to overlap all-gather
with GEMM"): the activation stays sharded, and the consuming Linear runs a
ring schedule

    for step in range(p):
        acc += x_chunk @ W[rows(chunk), local_cols]   # MXU
        x_chunk = ppermute(x_chunk, ring)             # ICI, overlapped

so each ICI transfer hides behind the previous partial contraction (XLA
pipelines the ppermute with the dot inside the unrolled loop).  The int32
accumulator is requantized once at the end with the standard fused epilogue
— bit-identical to gather-then-GEMM because integer partial sums are exact.

Used via ``shard_module(..., overlap=True)``: Linear layers consume their
predecessor's sharded output directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.gemm_int8 import _mult_vector


def ring_qgemm(x_chunk_u8, w_rows_kn, oc, *, axis_name: str, axis_size: int,
               scale_a, zp_a, scale_w, scale_c, zp_c, relu=False):
    """Quantized ring GEMM under shard_map.

    ``x_chunk_u8``: [M, K/p] — this device's channel chunk of the (u8)
    activation; chunk i on device i.
    ``w_rows_kn``: [K, N/p] — full contraction rows of the local output
    columns; rows are consumed chunk-by-chunk as activations rotate.
    ``oc``: [N/p] local slice of the s32 offset vector.

    Returns the local [M, N/p] u8 output (still channel-sharded).
    """
    p = axis_size
    m, k_chunk = x_chunk_u8.shape
    perm = [(i, (i + 1) % p) for i in range(p)]
    my = lax.axis_index(axis_name)

    def step(carry, i):
        x_chunk, acc = carry
        # Which global chunk this device currently holds: chunks rotate
        # forward, so at step i we hold chunk (my - i) mod p.
        src = (my - i) % p
        a = (x_chunk.astype(jnp.int32) - 128).astype(jnp.int8)
        w_rows = lax.dynamic_slice_in_dim(w_rows_kn, src * k_chunk, k_chunk,
                                          axis=0)
        acc = acc + lax.dot_general(
            a, w_rows,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # Rotate chunks for the next step (skipped result on the last step
        # is still overlapped by XLA; cheap to keep the loop uniform).
        x_next = lax.ppermute(x_chunk, axis_name, perm)
        return (x_next, acc), ()

    acc0 = jnp.zeros((m, w_rows_kn.shape[1]), jnp.int32)
    (_, acc), _ = lax.scan(step, (x_chunk_u8, acc0), jnp.arange(p))
    c = acc + oc.reshape(1, -1)
    mult = _mult_vector(scale_a, scale_w, scale_c, w_rows_kn.shape[1])
    q = c.astype(jnp.float32) * mult.reshape(1, -1) + jnp.float32(zp_c)
    q = jnp.clip(q, 0.0, 255.0)
    qi = q.astype(jnp.int32)
    if relu:
        qi = jnp.maximum(qi, int(zp_c))
    return qi.astype(jnp.uint8)


def ring_linear_reference(x_full_u8, w_kn, oc, **kw):
    """Single-device oracle with the same epilogue (for tests)."""
    from ..ops.gemm_int8 import qgemm_xla
    return qgemm_xla(x_full_u8, w_kn, oc, **kw)
