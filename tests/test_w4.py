"""W4 grouped weight-only (QuantConfig(weight_only=True, weight_bits=4)):
packed nibbles + per-group scales, Linear-only, 8x smaller weights."""

import numpy as np
import torch
import jax.numpy as jnp

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models
from int8inferenceengine_tpu.ops.w4 import dequant_w4, pack_w4


def test_pack_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.1, (48, 256)).astype(np.float32)
    packed, scales = pack_w4(w, group=64)
    assert packed.shape == (48, 128) and packed.dtype == jnp.uint8
    assert scales.shape == (48, 4)
    back = np.asarray(dequant_w4(packed, scales, 256, group=64))
    # symmetric 4-bit: error <= scale/2 per weight, scale = groupmax/7
    gmax = np.abs(w.reshape(48, 4, 64)).max(axis=2, keepdims=True)
    bound = np.broadcast_to(gmax / 14.0 + 1e-7, (48, 4, 64)).reshape(48, 256)
    assert (np.abs(back - w) <= bound).all()


def test_pack_short_last_group_and_odd_k():
    rng = np.random.default_rng(1)
    w = rng.normal(0, 1, (8, 96)).astype(np.float32)   # 96 = 64 + 32 short
    packed, scales = pack_w4(w, group=64)
    back = np.asarray(dequant_w4(packed, scales, 96, group=64))
    assert back.shape == (8, 96)
    assert np.abs(back - w).max() < np.abs(w).max() / 7 + 1e-6
    try:
        pack_w4(w[:, :95], group=64)
        assert False, "odd K must raise"
    except ValueError:
        pass


def test_w4_decoder_tracks_fp32():
    tw = models.torch_twin("gpt_tiny")
    m = models.build("gpt_tiny", config=QuantConfig(weight_only=True,
                                                    weight_bits=4,
                                                    w4_group=64))
    m.load(tw.state_dict())
    m.convert()
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 1000, (4, 16)).astype(np.int32)
    got = m(q.tensor(ids)).numpy()
    want = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    assert np.isfinite(got).all()
    agree = (got[:, -1].argmax(-1) == want[:, -1].argmax(-1)).mean()
    assert agree >= 0.75, agree
    # weights really are 4-bit packed
    layers = dict(m.named_layers())
    assert layers["wq1"].params["w4_packed"].dtype == jnp.uint8
    assert layers["wq1"].params["w4_packed"].size == 128 * 128 // 2
    # generate runs on the float KV cache path
    toks = m.generate(ids[:, :8], 5)
    assert toks.shape == (4, 5)


def test_w4_dynamic_act_rejected():
    m = models.build("lenet", config=QuantConfig(
        weight_only=True, weight_bits=4, dynamic_act=True))
    m.load(models.torch_twin("lenet").state_dict())
    try:
        m.convert()
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_mse_group_scales_cut_error():
    """optimize=True (the default via QuantConfig.w4_mse_scales): per-group
    MSE scale search beats max/7 at 4 bits on gaussian weights."""
    rng = np.random.default_rng(3)
    w = rng.normal(0, 0.1, (64, 512)).astype(np.float32)
    errs = {}
    for opt in (False, True):
        packed, scales = pack_w4(w, group=128, optimize=opt)
        back = np.asarray(dequant_w4(packed, scales, 512, group=128))
        errs[opt] = float(np.mean((back - w) ** 2))
    assert errs[True] < errs[False] * 0.92, errs


def test_pallas_w4_matmul_matches_xla():
    """The VMEM-unpacking kernel (interpret mode) == the XLA path."""
    from jax.experimental.pallas import tpu as pltpu
    from int8inferenceengine_tpu.ops.w4 import (w4_matmul_pallas,
                                                w4_matmul_xla)
    rng = np.random.default_rng(6)
    m, k, n, g = 8, 256, 96, 64
    w = rng.normal(0, 0.1, (n, k)).astype(np.float32)
    x = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, n).astype(np.float32))
    packed, scales = pack_w4(w, group=g)
    want = np.asarray(w4_matmul_xla(x, packed, scales, bias, k, g))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(w4_matmul_pallas(x, packed, scales, bias, k, g))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_w4_pallas_backend_via_config():
    """QuantConfig(w4_kernel='pallas') serves the decoder identically to
    the XLA backend (interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu
    tw = models.torch_twin("gpt_tiny")
    outs = {}
    ids = np.random.default_rng(7).integers(0, 1000, (2, 16)).astype(
        np.int32)
    for be in ("xla", "pallas"):
        m = models.build("gpt_tiny", config=QuantConfig(
            weight_only=True, weight_bits=4, w4_kernel=be))
        m.load(tw.state_dict())
        m.convert()
        with pltpu.force_tpu_interpret_mode():
            outs[be] = m(q.tensor(ids)).numpy()
    np.testing.assert_allclose(outs["xla"], outs["pallas"],
                               rtol=2e-4, atol=2e-4)
