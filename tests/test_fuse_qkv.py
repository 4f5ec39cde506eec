"""Merged QKV (QuantConfig(fuse_qkv=...)): one GEMM over the three
attention projections must be bit-identical to the separate calls —
per-column multiplier AND per-column zero point reproduce each head's
epilogue exactly."""

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models
from int8inferenceengine_tpu.layers import Linear, fused_qkv
from int8inferenceengine_tpu.ops.gemm_int8 import (compute_offset, qgemm,
                                                   qgemm_multi)


def _parts(seed=0, k=192, ns=(192, 192, 192)):
    rng = np.random.default_rng(seed)
    parts, kws = [], []
    for i, n in enumerate(ns):
        w = jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))
        qb = jnp.asarray(rng.integers(-127, 128, (n,), dtype=np.int8))
        kw = dict(scale_a=0.025, zp_a=127, scale_w=0.01 + 0.003 * i,
                  scale_c=0.05 + 0.01 * i, zp_c=90 + 17 * i)
        oc = compute_offset(qb, jnp.sum(w.astype(jnp.int32), 0),
                            scale_a=kw["scale_a"], zp_a=kw["zp_a"],
                            recentered=True)
        parts.append(dict(w_s8_kn=w, oc=oc, scale_w=kw["scale_w"],
                          scale_c=kw["scale_c"], zp_c=kw["zp_c"]))
        kws.append(kw)
    return parts, kws


def test_multi_matches_separate_xla():
    parts, kws = _parts()
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 256, (64, 192), dtype=np.uint8))
    outs = qgemm_multi(a, parts, scale_a=0.025, zp_a=127, backend="xla")
    for p, kw, got in zip(parts, kws, outs):
        want = qgemm(a, p["w_s8_kn"], p["oc"], backend="xla", **kw)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_multi_pallas_interpret_matches_xla():
    parts, _ = _parts(seed=2)
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(0, 256, (64, 192), dtype=np.uint8))
    want = qgemm_multi(a, parts, scale_a=0.025, zp_a=127, backend="xla")
    with pltpu.force_tpu_interpret_mode():
        got = qgemm_multi(a, parts, scale_a=0.025, zp_a=127,
                          backend="pallas")
    for g, w in zip(got, want):
        d = np.abs(np.asarray(g).astype(int) - np.asarray(w).astype(int))
        # cross-lowering convention: +-1 code on exact truncation
        # boundaries (FMA contraction differences), repo-wide
        assert d.max() <= 1 and (d == 0).mean() > 0.999, (
            d.max(), (d == 0).mean())


def test_model_fuse_qkv_bit_identical():
    """text_tiny and gpt_tiny with fuse_qkv='xla' equal 'off' exactly,
    including the decoder's cached generate()."""
    rng = np.random.default_rng(4)
    for name in ("text_tiny", "gpt_tiny"):
        ids = rng.integers(0, 1000, (4, 64)).astype(np.int32)
        outs, gens = {}, {}
        for mode in ("off", "xla"):
            m = models.build(name, config=QuantConfig(fuse_qkv=mode))
            m.load(models.torch_twin(name).state_dict())
            m.prepare()
            m(q.tensor(ids))
            m.convert()
            outs[mode] = m(q.tensor(ids)).numpy()
            if name == "gpt_tiny":
                gens[mode] = m.generate(ids[:2, :8], 4)
        np.testing.assert_array_equal(outs["off"], outs["xla"], name)
        if gens:
            np.testing.assert_array_equal(gens["off"], gens["xla"])


def test_fused_qkv_falls_back_on_float_input():
    """Float (weight_only) input must fall back to the composed calls."""
    m = models.build("gpt_tiny", config=QuantConfig(
        weight_only=True, fuse_qkv="xla"))
    m.load(models.torch_twin("gpt_tiny").state_dict())
    m.convert()
    ids = np.random.default_rng(5).integers(0, 1000, (2, 8)).astype(
        np.int32)
    out = m(q.tensor(ids)).numpy()
    assert np.isfinite(out).all()
