"""Quantized GEMM: Pallas kernel (interpret mode on CPU) vs the XLA path vs
a numpy scalar-loop oracle reproducing the reference pipeline
(fully_connected.cc:22-52 + quantize_utils.cc:27-36)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from int8inferenceengine_tpu.ops.gemm_int8 import (
    compute_offset, qgemm_pallas, qgemm_xla)


def _numpy_oracle(a_u8, w_kn, q_bias, sa, zpa, sw, sc, zpc, relu=False):
    acc = (a_u8.astype(np.int64) - zpa) @ w_kn.astype(np.int64)
    acc = acc + (q_bias.astype(np.float32) / np.float32(sa)).astype(np.int64)
    deq = acc.astype(np.float32) * np.float32(sa) * np.float32(sw)
    q = deq / np.float32(sc) + np.float32(zpc)
    q = np.clip(q, 0, 255).astype(np.int32)
    if relu:
        q = np.maximum(q, zpc)
    return q.astype(np.uint8)


def _mk(m, k, n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (m, k)).astype(np.uint8)
    w = rng.integers(-127, 128, (k, n)).astype(np.int8)
    qb = rng.integers(-127, 128, (n,)).astype(np.int8)
    return a, w, qb


SCALES = dict(scale_a=0.025, zp_a=127, scale_w=0.01, scale_c=0.05, zp_c=93)


@pytest.mark.parametrize("m,k,n", [(16, 32, 8), (100, 363, 96), (128, 512, 256)])
@pytest.mark.parametrize("relu", [False, True])
def test_xla_path_matches_numpy_oracle(m, k, n, relu):
    a, w, qb = _mk(m, k, n)
    rowsum = w.astype(np.int32).sum(axis=0)
    oc = compute_offset(jnp.asarray(qb), jnp.asarray(rowsum),
                        scale_a=SCALES["scale_a"], zp_a=SCALES["zp_a"],
                        recentered=True)
    out = qgemm_xla(jnp.asarray(a), jnp.asarray(w), oc, relu=relu, **SCALES)
    ref = _numpy_oracle(a, w, qb, SCALES["scale_a"], SCALES["zp_a"],
                        SCALES["scale_w"], SCALES["scale_c"], SCALES["zp_c"],
                        relu)
    mismatch = (np.asarray(out) != ref).mean()
    # f32 associativity in the epilogue can flip values sitting exactly on a
    # truncation boundary; demand bit-exactness on >=99.9%.
    assert mismatch < 1e-3, f"mismatch fraction {mismatch}"


@pytest.mark.parametrize("m,k,n", [(128, 256, 128), (100, 363, 96)])
def test_pallas_interpret_matches_xla(m, k, n):
    a, w, qb = _mk(m, k, n, seed=3)
    rowsum = w.astype(np.int32).sum(axis=0)
    oc = compute_offset(jnp.asarray(qb), jnp.asarray(rowsum),
                        scale_a=SCALES["scale_a"], zp_a=SCALES["zp_a"],
                        recentered=True)
    ref = qgemm_xla(jnp.asarray(a), jnp.asarray(w), oc, **SCALES)
    with pltpu.force_tpu_interpret_mode():
        out = qgemm_pallas(jnp.asarray(a), jnp.asarray(w), oc, **SCALES)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_pallas_tpu_matches_xla():
    a, w, qb = _mk(512, 1024, 512, seed=7)
    rowsum = w.astype(np.int32).sum(axis=0)
    oc = compute_offset(jnp.asarray(qb), jnp.asarray(rowsum),
                        scale_a=SCALES["scale_a"], zp_a=SCALES["zp_a"],
                        recentered=True)
    ref = qgemm_xla(jnp.asarray(a), jnp.asarray(w), oc, **SCALES)
    out = qgemm_pallas(jnp.asarray(a), jnp.asarray(w), oc, **SCALES)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
