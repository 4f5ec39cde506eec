"""Cached-decode fused attention (ops/attention.decode_attention): the
op must be bit-identical to the composed QuantMatmul -> QuantSoftmax
(valid_len) -> QuantMatmul chain, for scalar and per-slot valid lengths,
both roundings, XLA and (interpret-mode) Pallas backends — and the model
decode path through it must keep generate() bit-identical to the
composed path and to full-forward recompute."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from int8inferenceengine_tpu import models, tensor
from int8inferenceengine_tpu.config import QuantConfig
from int8inferenceengine_tpu.ops import attention as attn_ops
from int8inferenceengine_tpu.ops import quant as quant_ops
from int8inferenceengine_tpu.ops.qmatmul import qmatmul_act

B, H, T, D = 2, 3, 64, 16
PARAMS = dict(scale_q=0.021, zp_q=117, scale_k=0.034, zp_k=131,
              scale_v=0.027, zp_v=125, scale_s=0.19, zp_s=140,
              scale_p=0.0039, zp_p=0, scale_c=0.05, zp_c=128,
              alpha=D ** -0.5)


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).integers(0, 256, shape),
                       jnp.uint8)


def _composed(q, k, v, valid, rounding):
    """Literal layer math: qmatmul -> dequant/mask/softmax/requant ->
    qmatmul (what TextDecoder._block_decode runs with the fusion off)."""
    import jax
    from jax import lax
    p = PARAMS
    s = qmatmul_act(q, k, scale_a=p["scale_q"], zp_a=p["zp_q"],
                    scale_b=p["scale_k"], zp_b=p["zp_k"],
                    scale_c=p["scale_s"], zp_c=p["zp_s"],
                    alpha=p["alpha"], transpose_b=True, rounding=rounding)
    f = quant_ops.dequantize_u8(s, p["scale_s"], p["zp_s"])
    col = lax.broadcasted_iota(jnp.int32, (1, T), 1)
    f = jnp.where(col < valid, f, -jnp.inf)
    pr = quant_ops.quantize_u8(jax.nn.softmax(f, axis=-1),
                               p["scale_p"], p["zp_p"], rounding)
    return qmatmul_act(pr, v, scale_a=p["scale_p"], zp_a=p["zp_p"],
                       scale_b=p["scale_v"], zp_b=p["zp_v"],
                       scale_c=p["scale_c"], zp_c=p["zp_c"],
                       rounding=rounding)


@pytest.mark.parametrize("rounding", ["trunc", "nearest"])
@pytest.mark.parametrize("valid", [1, 7, T])
def test_xla_matches_composed_scalar_valid(rounding, valid):
    q, k, v = _rand((B, H, 1, D), 0), _rand((B, H, T, D), 1), \
        _rand((B, H, T, D), 2)
    want = np.asarray(_composed(q, k, v, jnp.int32(valid), rounding))
    got = np.asarray(attn_ops.decode_attention(
        q, k, v, jnp.int32(valid), backend="xla", rounding=rounding,
        **PARAMS))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("rounding", ["trunc", "nearest"])
def test_pallas_interpret_matches_xla(rounding):
    q, k, v = _rand((B, H, 1, D), 3), _rand((B, H, T, D), 4), \
        _rand((B, H, T, D), 5)
    valid = jnp.asarray([3, T], jnp.int32)          # per-slot positions
    want = np.asarray(attn_ops.decode_attention(
        q, k, v, valid.reshape(B, 1, 1, 1), backend="xla",
        rounding=rounding, **PARAMS))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(attn_ops.decode_attention(
            q, k, v, valid, backend="pallas", rounding=rounding, **PARAMS))
    assert np.array_equal(got, want)


def test_per_slot_valid_matches_rowwise_scalar():
    q, k, v = _rand((B, H, 1, D), 6), _rand((B, H, T, D), 7), \
        _rand((B, H, T, D), 8)
    valid = jnp.asarray([5, 11], jnp.int32)
    got = np.asarray(attn_ops.decode_attention(
        q, k, v, valid.reshape(B, 1, 1, 1), backend="xla", **PARAMS))
    for row in range(B):
        want = np.asarray(attn_ops.decode_attention(
            q[row:row + 1], k[row:row + 1], v[row:row + 1],
            jnp.int32(int(valid[row])), backend="xla", **PARAMS))
        assert np.array_equal(got[row:row + 1], want)


def test_rejects_multi_row_query():
    q, k, v = _rand((B, H, 2, D), 9), _rand((B, H, T, D), 10), \
        _rand((B, H, T, D), 11)
    with pytest.raises(ValueError):
        attn_ops.decode_attention(q, k, v, jnp.int32(4), backend="xla",
                                  **PARAMS)


def _tiny(cfg):
    import torch
    torch.manual_seed(0)
    tw = models.torch_twin("gpt_tiny")
    m = models.build("gpt_tiny", config=cfg)
    m.load(tw.state_dict())
    return m


def _calibrated(cfg, ids):
    m = _tiny(cfg)
    m.prepare()
    m(tensor(ids))
    m.convert()
    return m


def test_generate_bit_identical_fused_vs_composed():
    ids = np.random.default_rng(0).integers(0, 1000, (3, 12)).astype(
        np.int32)
    toks_off = _calibrated(QuantConfig(decode_attention="off"),
                           ids).generate(ids, 10)
    toks_xla = _calibrated(QuantConfig(decode_attention="xla"),
                           ids).generate(ids, 10)
    assert np.array_equal(toks_off, toks_xla)
    m = _calibrated(QuantConfig(decode_attention="pallas"), ids)
    with pltpu.force_tpu_interpret_mode():
        toks_pal = m.generate(ids, 10)
    assert np.array_equal(toks_off, toks_pal)


def test_generate_matches_full_forward_recompute():
    """The decode-path invariant survives the fused op: cached decode ==
    argmax over the full forward at each step."""
    ids = np.random.default_rng(1).integers(0, 1000, (2, 8)).astype(
        np.int32)
    m = _calibrated(QuantConfig(decode_attention="xla"), ids)
    toks = np.asarray(m.generate(ids, 6))
    cur = ids
    for s in range(6):
        logits = m(tensor(cur)).numpy()
        nxt = logits[:, -1].argmax(-1).astype(np.int32)
        assert np.array_equal(nxt, toks[:, s]), s
        cur = np.concatenate([cur, nxt[:, None]], 1)


def test_weight_only_decode_unaffected():
    """Float-KV-cache modes bypass the fused op (u8-only) and still run."""
    ids = np.random.default_rng(2).integers(0, 1000, (2, 8)).astype(
        np.int32)
    m = _tiny(QuantConfig(weight_only=True))
    m.convert()
    toks = m.generate(ids, 4)
    assert toks.shape == (2, 4)


@pytest.mark.parametrize("t_cache", [128, 512, 2048])
def test_flat_kernel_matches_oracle_any_length(t_cache):
    """decode_attention_flat (the T-major serving path): the blockwise
    Pallas kernel must match the composed oracle at any cache length —
    per-block i32 accumulation removed the old 2^24 / T<=1024 bound —
    for scalar and per-slot valid lengths.  (±1-code ties at exact
    rounding boundaries are the documented FMA-contraction caveat of the
    interpret-vs-jit comparison; on-chip trunc runs match exactly.)"""
    h, d = 4, 64
    c = h * d
    rng = np.random.default_rng(t_cache)
    q = jnp.asarray(rng.integers(0, 256, (3, c)), jnp.uint8)
    k = jnp.asarray(rng.integers(0, 256, (3, t_cache, c)), jnp.uint8)
    v = jnp.asarray(rng.integers(0, 256, (3, t_cache, c)), jnp.uint8)
    kw = dict(PARAMS)
    kw["alpha"] = d ** -0.5
    for valid in (1, 77, t_cache):
        want = np.asarray(attn_ops.decode_attention_flat(
            q, k, v, jnp.int32(valid), n_heads=h, backend="xla",
            rounding="trunc", **kw)).astype(np.int32)
        got = np.asarray(attn_ops.decode_attention_flat(
            q, k, v, jnp.int32(valid), n_heads=h, backend="pallas",
            interpret=True, rounding="trunc", **kw)).astype(np.int32)
        diff = np.abs(got - want)
        assert diff.max() <= 1 and (diff > 0).mean() <= 0.002, (
            valid, diff.max(), (diff > 0).sum())
    # per-slot valid vector
    vv = jnp.asarray(rng.integers(1, t_cache + 1, (3,)), jnp.int32)
    want = np.asarray(attn_ops.decode_attention_flat(
        q, k, v, vv, n_heads=h, backend="xla", rounding="trunc",
        **kw)).astype(np.int32)
    got = np.asarray(attn_ops.decode_attention_flat(
        q, k, v, vv, n_heads=h, backend="pallas", interpret=True,
        rounding="trunc", **kw)).astype(np.int32)
    assert np.abs(got - want).max() <= 1


def test_flat_matches_headsplit_api():
    """The [B, H, T, D] compat API is a transpose wrapper over the flat
    op: both must give identical codes (transposes are exact)."""
    h, d, t = 3, 32, 64
    c = h * d
    rng = np.random.default_rng(9)
    q4 = jnp.asarray(rng.integers(0, 256, (2, h, 1, d)), jnp.uint8)
    k4 = jnp.asarray(rng.integers(0, 256, (2, h, t, d)), jnp.uint8)
    v4 = jnp.asarray(rng.integers(0, 256, (2, h, t, d)), jnp.uint8)
    kw = dict(PARAMS)
    kw["alpha"] = d ** -0.5

    def flat(x4):
        return jnp.transpose(x4, (0, 2, 1, 3)).reshape(2, -1, c)

    out4 = np.asarray(attn_ops.decode_attention(
        q4, k4, v4, jnp.int32(40), backend="xla", rounding="trunc", **kw))
    out2 = np.asarray(attn_ops.decode_attention_flat(
        flat(q4).reshape(2, c), flat(k4), flat(v4), jnp.int32(40),
        n_heads=h, backend="xla", rounding="trunc", **kw))
    want = np.asarray(jnp.transpose(out4, (0, 2, 1, 3)).reshape(2, c))
    assert np.array_equal(out2, want)


@pytest.mark.parametrize("h,kv,d", [(4, 2, 64), (8, 2, 32), (6, 1, 64),
                                    (4, 4, 64)])
def test_flat_kernel_gqa_matches_oracle(h, kv, d):
    """GQA in the flat kernel (round 3): kv-major query rows against the
    kv-COMPACT cache, per-group extraction — must match the composed XLA
    GQA oracle at valid in {1, odd, T} and per-slot vectors, for every
    grouping incl. MQA (kv=1) and the MHA degenerate case (kv=h)."""
    t = 128
    c = kv * d
    rng = np.random.default_rng(h * 100 + kv)
    q = jnp.asarray(rng.integers(0, 256, (3, h * d)), jnp.uint8)
    k = jnp.asarray(rng.integers(0, 256, (3, t, c)), jnp.uint8)
    v = jnp.asarray(rng.integers(0, 256, (3, t, c)), jnp.uint8)
    kw = dict(PARAMS)
    kw["alpha"] = d ** -0.5
    for valid in (jnp.int32(1), jnp.int32(77), jnp.int32(t),
                  jnp.asarray(rng.integers(1, t + 1, (3,)), jnp.int32)):
        want = np.asarray(attn_ops.decode_attention_flat(
            q, k, v, valid, n_heads=h, n_kv_heads=kv, backend="xla",
            rounding="trunc", **kw)).astype(np.int32)
        got = np.asarray(attn_ops.decode_attention_flat(
            q, k, v, valid, n_heads=h, n_kv_heads=kv, backend="pallas",
            interpret=True, rounding="trunc", **kw)).astype(np.int32)
        diff = np.abs(got - want)
        assert diff.max() <= 1 and (diff > 0).mean() <= 0.002, (
            valid, diff.max(), (diff > 0).sum())


@pytest.mark.parametrize("h", [6, 4, 3, 2])
def test_flat_kernel_headshard_widths(h):
    """TP head-shard widths (VERDICT r2 #6): a gpt2-small head-sharded
    decode runs the kernel on c_local = h*64 in {384, 256, 192, 128} —
    the kernel must stay oracle-exact at every local width (semantics;
    the on-chip lowering/perf rule lives in tools/llama_decode_tpu.py
    and the 'auto' guard comment)."""
    d, t = 64, 128
    c = h * d
    rng = np.random.default_rng(h)
    q = jnp.asarray(rng.integers(0, 256, (3, c)), jnp.uint8)
    k = jnp.asarray(rng.integers(0, 256, (3, t, c)), jnp.uint8)
    v = jnp.asarray(rng.integers(0, 256, (3, t, c)), jnp.uint8)
    kw = dict(PARAMS)
    kw["alpha"] = d ** -0.5
    for valid in (1, 65, t):
        want = np.asarray(attn_ops.decode_attention_flat(
            q, k, v, jnp.int32(valid), n_heads=h, backend="xla",
            rounding="trunc", **kw)).astype(np.int32)
        got = np.asarray(attn_ops.decode_attention_flat(
            q, k, v, jnp.int32(valid), n_heads=h, backend="pallas",
            interpret=True, rounding="trunc", **kw)).astype(np.int32)
        diff = np.abs(got - want)
        assert diff.max() <= 1 and (diff > 0).mean() <= 0.002, (
            h, valid, diff.max())


@pytest.mark.parametrize("h,kv,mrows", [(4, 4, 3), (4, 2, 4), (6, 1, 2)])
def test_flat_kernel_multiposition(h, kv, mrows):
    """Multi-position extend (speculative verify): the kernel runs all
    m*H query rows in one call; row j sees valid+j columns.  Oracle: m
    single-row calls at valid+j on the same (fully appended) cache —
    and the XLA multi path must match it exactly, the kernel to the
    documented +-1 tie caveat."""
    d, t = 32, 128
    c = kv * d
    rng = np.random.default_rng(h * 10 + kv + mrows)
    q3 = jnp.asarray(rng.integers(0, 256, (3, mrows, h * d)), jnp.uint8)
    k = jnp.asarray(rng.integers(0, 256, (3, t, c)), jnp.uint8)
    v = jnp.asarray(rng.integers(0, 256, (3, t, c)), jnp.uint8)
    kw = dict(PARAMS)
    kw["alpha"] = d ** -0.5
    for base in (1, 61, t - mrows + 1):
        want = np.stack([
            np.asarray(attn_ops.decode_attention_flat(
                q3[:, j], k, v, jnp.int32(base + j), n_heads=h,
                n_kv_heads=kv, backend="xla", rounding="trunc", **kw))
            for j in range(mrows)], axis=1)          # [B, m, H*D]
        got_xla = np.asarray(attn_ops.decode_attention_flat(
            q3, k, v, jnp.int32(base), n_heads=h, n_kv_heads=kv,
            backend="xla", rounding="trunc", **kw))
        np.testing.assert_array_equal(got_xla, want)
        got_pl = np.asarray(attn_ops.decode_attention_flat(
            q3, k, v, jnp.int32(base), n_heads=h, n_kv_heads=kv,
            backend="pallas", interpret=True, rounding="trunc",
            **kw)).astype(np.int32)
        diff = np.abs(got_pl - want.astype(np.int32))
        assert diff.max() <= 1 and (diff > 0).mean() <= 0.002, (
            base, diff.max(), (diff > 0).sum())


@pytest.mark.parametrize("h,kv,mq", [(4, 4, 1), (4, 1, 1), (6, 2, 3)])
def test_flat_kernel_merged_matches_walk(h, kv, mq):
    """The merged-dot kernel revision (one live-prefix DMA + one dot per
    512-column chunk per phase — ops/attention.py round-4 note) must be
    bit-identical to the per-block walk it replaced: same integer math,
    same grain of exactness (each f32 chunk dot contracts <= 512
    positions so partial sums stay < 2^24; cross-chunk accumulation is
    i32).  On-chip evidence: tools/decode_kernel_v4.py (2026-08-20,
    EXACT at valid 1/200/max for MHA/GQA/mq and T=2048; faster at every
    measured shape)."""
    d = 64
    c = kv * d
    t = 256
    rng = np.random.default_rng(h * 100 + kv * 10 + mq)
    qshape = (2, mq, h * d) if mq > 1 else (2, h * d)
    q = jnp.asarray(rng.integers(0, 256, qshape), jnp.uint8)
    k = jnp.asarray(rng.integers(0, 256, (2, t, c)), jnp.uint8)
    v = jnp.asarray(rng.integers(0, 256, (2, t, c)), jnp.uint8)
    kw = dict(PARAMS)
    kw["alpha"] = d ** -0.5
    for valid in (1, 100, t - mq):
        outs = {}
        for merged in (False, True):
            outs[merged] = np.asarray(attn_ops.decode_attention_flat(
                q, k, v, jnp.int32(valid), n_heads=h, n_kv_heads=kv,
                backend="pallas", merged=merged, interpret=True,
                rounding="trunc", **kw))
        assert (outs[True] == outs[False]).all(), valid
