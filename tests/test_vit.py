"""INT8 transformer tests: QuantMatmul / QuantSoftmax / QuantLayerNorm /
QuantPosEmbed units + the ViT family end-to-end.

The act x act matmul is checked against an exact integer numpy oracle (the
whole pipeline up to the requant epilogue is integer-exact, see
ops/qmatmul.py); the ViT runs the reference differential workflow with a
statistical acceptance like the reference's own integration test
(unittest/test_quantized_layer.py:59-61).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu.layers import (QuantLayerNorm, QuantMatmul,
                                            QuantPosEmbed, QuantSoftmax)
from int8inferenceengine_tpu.ops import functional as F
from int8inferenceengine_tpu.ops.qmatmul import qmatmul_act
from int8inferenceengine_tpu.tensor import Tensor


def _rand(shape, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=shape).astype(np.float32)


def _rand_u8(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape,
                                                dtype=np.uint8)


@pytest.mark.parametrize("transpose_b", [False, True])
def test_qmatmul_act_exact_integer_oracle(transpose_b):
    """The s32 accumulation must equal sum_k (a-zp_a)(b-zp_b) exactly."""
    import jax.numpy as jnp
    B, M, K, N = 3, 5, 16, 7
    a = _rand_u8((B, M, K), 1)
    b = _rand_u8((B, N, K) if transpose_b else (B, K, N), 2)
    sa, za, sb, zb, sc, zc, alpha = 0.04, 131, 0.09, 17, 0.02, 99, 0.25
    got = np.asarray(qmatmul_act(
        jnp.asarray(a), jnp.asarray(b), scale_a=sa, zp_a=za, scale_b=sb,
        zp_b=zb, scale_c=sc, zp_c=zc, alpha=alpha, transpose_b=transpose_b))
    bm = b.astype(np.int64).transpose(0, 2, 1) if transpose_b \
        else b.astype(np.int64)
    acc = np.matmul(a.astype(np.int64) - za, bm - zb)
    want = np.clip(acc.astype(np.float32) * np.float32(
        np.float32(sa) * np.float32(sb) * np.float32(alpha)
        / np.float32(sc)) + zc, 0, 255).astype(np.int32).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_qmatmul_fp32_and_lifecycle():
    mm = QuantMatmul(alpha=0.5, transpose_b=True)
    a, b = _rand((2, 3, 4, 8), 1), _rand((2, 3, 6, 8), 2)
    out = mm(Tensor(np.asarray(a)), Tensor(np.asarray(b))).numpy()
    want = 0.5 * np.matmul(a, b.transpose(0, 1, 3, 2))
    np.testing.assert_allclose(out, want, atol=1e-5)
    # calibrated INT8 path tracks the float product
    mm.prepare()
    mm(Tensor(np.asarray(a)), Tensor(np.asarray(b)))
    mm.convert()
    qa = F.quantize(q.tensor(a), 0.01, 128)
    qb = F.quantize(q.tensor(b), 0.01, 128)
    got = F.dequantize(mm(qa, qb)).numpy()
    assert np.abs(got - want).max() < 3 * mm.scale + 0.05


def test_qmatmul_guards():
    mm = QuantMatmul()
    with pytest.raises(ValueError, match="both"):
        mm(Tensor(np.zeros((2, 3, 4), np.float32)),
           F.quantize(q.tensor(_rand((2, 4, 3))), 0.1, 0))
    with pytest.raises(TypeError, match="uint8"):
        qmatmul_act(np.zeros((2, 2), np.int8), np.zeros((2, 2), np.uint8),
                    scale_a=1, zp_a=0, scale_b=1, zp_b=0, scale_c=1, zp_c=0)


def test_layernorm_matches_torch():
    ln = QuantLayerNorm(32)
    tln = torch.nn.LayerNorm(32)
    torch.manual_seed(0)
    torch.nn.init.normal_(tln.weight)
    torch.nn.init.normal_(tln.bias)
    ln.load_weight(tln.weight.detach().numpy())
    ln.load_bias(tln.bias.detach().numpy())
    x = _rand((4, 7, 32), 3)
    got = ln(Tensor(np.asarray(x))).numpy()
    want = tln(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
    with pytest.raises(ValueError, match="last-dim"):
        ln(Tensor(np.zeros((2, 16), np.float32)))


def test_softmax_int8_rows_sum_to_one():
    sm = QuantSoftmax()
    x = _rand((2, 4, 9), 5, lo=-3, hi=3)
    out = sm(Tensor(np.asarray(x))).numpy()
    np.testing.assert_allclose(
        out, tF.softmax(torch.tensor(x), dim=-1).numpy(), atol=1e-6)
    sm.prepare(); sm(Tensor(np.asarray(x))); sm.convert()
    qx = F.quantize(q.tensor(x), 0.03, 128)
    deq = F.dequantize(sm(qx)).numpy()
    np.testing.assert_allclose(deq.sum(-1), 1.0, atol=0.1)


def test_pos_embed_guards_and_fp32():
    pe = QuantPosEmbed(4, 8)
    pe.load_weight(_rand((5, 8), 1))
    pe.load_bias(_rand((8,), 2))
    x = _rand((3, 4, 8), 3)
    out = pe(Tensor(np.asarray(x))).numpy()
    assert out.shape == (3, 5, 8)
    w, b = np.asarray(pe.params["weight"]), np.asarray(pe.params["bias"])
    want = np.concatenate(
        [np.broadcast_to(b, (3, 1, 8)), x], axis=1) + w
    np.testing.assert_allclose(out, want, atol=1e-6)
    with pytest.raises(ValueError, match="tokens"):
        pe(Tensor(np.zeros((2, 9, 8), np.float32)))


def test_token_layout_ops():
    x = F.quantize(q.tensor(_rand((2, 6, 4, 4))), 0.05, 128)  # NCHW float->q
    toks = F.to_tokens(x)
    assert toks.shape == (2, 16, 6)
    h = F.split_heads(toks, 2)
    assert h.shape == (2, 2, 16, 3)
    back = F.merge_heads(h)
    np.testing.assert_array_equal(np.asarray(back.data),
                                  np.asarray(toks.data))
    t0 = F.select_token(toks, 0)
    assert t0.shape == (2, 6) and t0.scale == x.scale
    with pytest.raises(ValueError, match="divisible"):
        F.split_heads(toks, 4)


def test_vit_ptq_lifecycle():
    """Reference differential workflow on a small ViT: exact FP32 parity,
    then INT8 argmax agreement (statistical, like the reference's
    integration tolerance)."""
    torch.set_num_threads(1)
    kw = dict(img_size=32, patch=8, dim=64, depth=2, heads=2, mlp_ratio=2)
    tm = models_vit_twin(**kw)
    mm = models_vit(**kw)
    mm.load(tm.state_dict())
    x = _rand((64, 3, 32, 32), 0)
    ref = tm(torch.tensor(x)).detach().numpy()
    out = mm(q.tensor(x)).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-4)
    mm.prepare()
    mm(q.tensor(_rand((16, 3, 32, 32), 9)))
    mm.convert()
    qo = mm(q.tensor(x)).numpy()
    assert qo.shape == ref.shape and np.isfinite(qo).all()
    agree = (qo.argmax(1) == ref.argmax(1)).mean()
    assert agree >= 0.7, agree


def models_vit(**kw):
    from int8inferenceengine_tpu.models.vit import ViT
    return ViT(**kw)


def models_vit_twin(**kw):
    from int8inferenceengine_tpu.models.vit import torch_vit
    return torch_vit(**kw)


def test_vit_sharded_equals_unsharded():
    from int8inferenceengine_tpu.parallel.mesh import make_mesh
    torch.set_num_threads(1)
    kw = dict(img_size=32, patch=8, dim=64, depth=2, heads=2, mlp_ratio=2)
    tm = models_vit_twin(**kw)
    mm = models_vit(**kw)
    mm.load(tm.state_dict())
    x = _rand((8, 3, 32, 32), 0)
    mm.prepare(); mm(q.tensor(x)); mm.convert()
    base = mm(q.tensor(x)).numpy()
    mm.shard(make_mesh((2, 4)))
    np.testing.assert_array_equal(mm(q.tensor(x)).numpy(), base)


def test_vit_registry():
    from int8inferenceengine_tpu import models
    mm = models.build("vit_tiny", img_size=32, patch=16, dim=32, depth=1,
                      heads=2)
    assert mm.INPUT_SHAPE == (3, 32, 32)
    with pytest.raises(ValueError, match="divisible"):
        models_vit(img_size=30, patch=16)
    with pytest.raises(ValueError, match="divisible"):
        models_vit(dim=30, heads=4)
