"""MoEDecoder / QuantMoE: top-k routed SwiGLU experts.

FP32 parity vs the torch oracle, the inherited cached-decode invariant,
expert-parallel bit-exactness (top-2 combine commutativity), checkpoint
round-trip, and speculative decoding over the MoE stack."""

import numpy as np
import pytest
import torch

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import QuantConfig, models, utils
from int8inferenceengine_tpu.models.moe import MoEDecoder, torch_moe


def _ids(b, t, seed=0):
    return np.random.default_rng(seed).integers(
        0, 1000, size=(b, t)).astype(np.int32)


def _built(config=None, **kw):
    kw.setdefault("kv_heads", 2)
    m = MoEDecoder(config=config or QuantConfig(rounding="nearest"), **kw)
    tw = torch_moe(**kw)
    m.load(tw.state_dict())
    return m, tw


def _calibrated(m, seed=1):
    m.prepare()
    m(q.tensor(_ids(8, 64, seed)))
    m.convert()
    return m


def test_fp32_parity_vs_torch():
    m, tw = _built()
    ids = _ids(4, 24)
    want = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    got = m(q.tensor(ids)).numpy()
    assert got.shape == want.shape == (4, 24, 1000)
    assert np.abs(got - want).max() < 3e-4, np.abs(got - want).max()


@pytest.mark.parametrize("top_k,n_experts", [(1, 4), (2, 4), (3, 4)])
def test_fp32_parity_topk_variants(top_k, n_experts):
    m, tw = _built(top_k=top_k, n_experts=n_experts)
    ids = _ids(2, 16, seed=top_k)
    want = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    got = m(q.tensor(ids)).numpy()
    assert np.abs(got - want).max() < 3e-4, np.abs(got - want).max()


def test_int8_runs_and_tracks_fp32():
    m, tw = _built()
    ids = _ids(16, 32, seed=3)
    want = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    _calibrated(m)
    got = m(q.tensor(ids)).numpy()
    assert np.isfinite(got).all()
    agree = (got[:, -1].argmax(-1) == want[:, -1].argmax(-1)).mean()
    assert agree >= 0.75, agree


def test_cached_decode_bit_identical_to_full_forward():
    """The MLP is positionwise, so the MoE swap must not disturb the
    cached-decode == full-forward invariant."""
    m, _ = _built()
    _calibrated(m)
    b, t0, steps = 3, 7, 8
    prompt = _ids(b, t0, seed=5)
    got = m.generate(prompt, steps)
    seq = prompt.copy()
    for s in range(steps):
        nxt = m(q.tensor(seq)).numpy()[:, -1].argmax(-1).astype(np.int32)
        np.testing.assert_array_equal(got[:, s], nxt, f"step {s}")
        seq = np.concatenate([seq, nxt[:, None]], axis=1)


def test_expert_parallel_bit_exact():
    """EP over mesh (4, 2): each device holds 2 of 4 experts; the psum
    combine is bit-exact at top_k=2 (two-term IEEE addition commutes).
    Forward AND generate."""
    from int8inferenceengine_tpu.parallel.mesh import make_mesh
    m, _ = _built(max_len=32)
    _calibrated(m)
    ids = _ids(4, 12, seed=7)
    want = m(q.tensor(ids)).numpy()
    want_toks = m.generate(ids, 8)
    m.shard(make_mesh((4, 2)))
    assert m.moe1._tp_expert, "expert role did not engage"
    assert m.wq1._tp_local and m.proj1._tp_row  # attention TP composes
    got = m(q.tensor(ids)).numpy()
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(m.generate(ids, 8), want_toks)


def test_expert_parallel_fp32_serving():
    """shard() before convert (FP32 serving) also engages EP.  Same
    contract as row-parallel FP32 Linear: allclose, not bit-exact — the
    float expert GEMMs may tile (and so accumulate) differently between
    the sharded and unsharded programs; the INT8 path is the bit-exact
    one (integer inner dots + two-term f32 combine)."""
    from int8inferenceengine_tpu.parallel.mesh import make_mesh
    m, _ = _built()
    ids = _ids(4, 12, seed=9)
    want = m(q.tensor(ids)).numpy()
    m.shard(make_mesh((4, 2)))
    got = m(q.tensor(ids)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_experts_not_divisible_falls_back_replicated():
    from int8inferenceengine_tpu.parallel.mesh import make_mesh
    m, _ = _built(n_experts=3, top_k=2)
    _calibrated(m)
    ids = _ids(4, 8, seed=11)
    want = m(q.tensor(ids)).numpy()
    m.shard(make_mesh((4, 2)))
    assert not m.moe1._tp_expert          # 3 % 2 != 0 -> replicated
    np.testing.assert_array_equal(m(q.tensor(ids)).numpy(), want)


def test_checkpoint_roundtrip(tmp_path):
    m, _ = _built()
    _calibrated(m)
    ids = _ids(3, 10, seed=13)
    base = m(q.tensor(ids)).numpy()
    base_toks = m.generate(ids, 6)
    path = str(tmp_path / "moe_int8.npz")
    utils.save(m, path)
    fresh = models.build("moe_tiny", config=QuantConfig(rounding="nearest"))
    utils.load(fresh, path)
    assert fresh.is_quant
    np.testing.assert_array_equal(fresh(q.tensor(ids)).numpy(), base)
    np.testing.assert_array_equal(fresh.generate(ids, 6), base_toks)


def test_speculative_over_moe():
    """A dense llama draft speculating for an MoE target — spec output
    equals greedy generate (the verify pass runs the MoE extend path)."""
    m, _ = _built()
    _calibrated(m)
    draft = models.build("gpt_tiny", dim=64, depth=1, heads=2)
    from int8inferenceengine_tpu.models.text_decoder import \
        torch_text_decoder
    draft.load(torch_text_decoder(dim=64, depth=1, heads=2).state_dict())
    draft.prepare(); draft(q.tensor(_ids(8, 64, 15))); draft.convert()
    prompt = _ids(3, 9, seed=17)
    want = m.generate(prompt, 10)
    got = m.generate_speculative(draft, prompt, 10, k=3)
    np.testing.assert_array_equal(got, want)


def test_registry_builds():
    m = models.build("moe_tiny", config=QuantConfig())
    tw = models.torch_twin("moe_tiny")
    m.load(tw.state_dict())
    ids = _ids(2, 8)
    want = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    got = m(q.tensor(ids)).numpy()
    assert np.abs(got - want).max() < 3e-4


def test_weight_only_float_activation_contract():
    """weight_only=True: MoE experts must honor the mode's contract —
    float activations end to end (error = weight rounding only), NOT
    the dynamic-act path (round-3 review finding).  The output stays
    close to the FP32 twin, and cached decode matches recompute."""
    m, tw = _built(config=QuantConfig(weight_only=True))
    m.convert()                       # no calibration in weight_only
    ids = _ids(4, 12, seed=19)
    want = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
    got = m(q.tensor(ids)).numpy()
    err = np.abs(got - want).max()
    assert err < 0.15, err            # s8 weight rounding only
    # the discriminator: dynamic-act (what the bug made weight_only run)
    # adds activation-quantization noise on top
    md, _ = _built(config=QuantConfig(weight_only=True, dynamic_act=True))
    md.convert()
    errd = np.abs(md(q.tensor(ids)).numpy() - want).max()
    assert err < errd, (err, errd)
    toks = m.generate(ids, 5)
    seq = ids.copy()
    for s in range(5):
        nxt = m(q.tensor(seq)).numpy()[:, -1].argmax(-1).astype(np.int32)
        np.testing.assert_array_equal(toks[:, s], nxt)
        seq = np.concatenate([seq, nxt[:, None]], axis=1)


def test_smooth_pairs_skip_moe_boundary():
    """transformer_smooth_pairs on the MoE family: attention + head
    boundaries smooth, the ln2->router/experts boundary is skipped
    (router top-k selection is per-channel scale-sensitive) — and the
    FP32 function is invariant (round-3 review: this used to KeyError)."""
    m, _ = _built()
    ids = _ids(4, 16, seed=21)
    want = m(q.tensor(ids)).numpy()
    pairs = utils.transformer_smooth_pairs(m)
    assert not any("moe" in n for _, names in pairs for n in names)
    utils.smooth(m, pairs, ids)
    got = m(q.tensor(ids)).numpy()
    assert np.abs(got - want).max() < 3e-4


def test_per_channel_expert_scales_reduce_error():
    """weight_per_channel=True gives per-expert-ROW weight scales
    ([E, H]/[E, K]); weight-only output error vs the FP32 twin must not
    exceed the per-tensor-per-expert error (and typically improves)."""
    ids = _ids(4, 12, seed=23)
    errs = {}
    for per_ch in (False, True):
        m, tw = _built(config=QuantConfig(weight_only=True,
                                          weight_per_channel=per_ch))
        m.convert()
        want = tw(torch.tensor(ids, dtype=torch.long)).detach().numpy()
        errs[per_ch] = float(np.abs(m(q.tensor(ids)).numpy() - want).max())
    assert errs[True] <= errs[False] * 1.05, errs
    # and the EP-sharded INT8 static path stays bit-exact with them
    from int8inferenceengine_tpu.parallel.mesh import make_mesh
    m, _ = _built(config=QuantConfig(rounding="nearest",
                                     weight_per_channel=True))
    _calibrated(m)
    want = m(q.tensor(ids)).numpy()
    m.shard(make_mesh((4, 2)))
    np.testing.assert_array_equal(m(q.tensor(ids)).numpy(), want)


@pytest.mark.parametrize("n_experts,top_k", [(4, 2), (8, 2), (16, 1),
                                             (8, 3)])
def test_sparse_dispatch_bit_exact(n_experts, top_k):
    """dispatch='sparse' (lax.scan over experts + lax.cond skipping
    unrouted experts' weight reads at runtime — layers.QuantMoE) must
    be BIT-identical to dense dispatch on the INT8 path: per-expert
    math is unchanged, the combine accumulates in the same expert
    order, and a skipped expert contributes exactly the 0.0 its zero
    routing weight contributes densely."""
    from int8inferenceengine_tpu.layers import QuantMoE
    rng = np.random.default_rng(n_experts * 10 + top_k)
    E, dim, hid = n_experts, 64, 128
    W = dict(
        router=rng.normal(scale=0.5, size=(E, dim)).astype(np.float32),
        gate_w=rng.normal(scale=0.1, size=(E, hid, dim)).astype(
            np.float32),
        up_w=rng.normal(scale=0.1, size=(E, hid, dim)).astype(
            np.float32),
        down_w=rng.normal(scale=0.1, size=(E, dim, hid)).astype(
            np.float32))
    x = rng.normal(size=(8, dim)).astype(np.float32)
    xi = np.clip(np.round(x / 0.02) + 128, 0, 255).astype(np.uint8)
    outs = {}
    for disp in ("dense", "sparse"):
        m = QuantMoE(dim, hid, E, top_k, dispatch=disp)
        for k, v in W.items():
            getattr(m, "load_" + k)(v)
        m.prepare()
        m(q.tensor(x))
        m.convert()
        outs[disp] = np.asarray(m(q.Tensor(xi, 0.02, 128)).data)
    assert np.array_equal(outs["dense"], outs["sparse"])


def test_sparse_dispatch_model_level():
    """moe_tiny with dispatch='sparse' generates identically to dense
    (the in-model exactness surface: routing inside the decode scan)."""
    from __graft_entry__ import _load_random_weights
    outs = {}
    for disp in ("dense", "sparse"):
        m = models.build("moe_tiny", vocab_size=128, max_len=48,
                         dim=64, depth=2, heads=4, kv_heads=2,
                         n_experts=8, top_k=2, dispatch=disp,
                         config=QuantConfig(rounding="nearest"))
        _load_random_weights(m)
        ids = np.random.default_rng(3).integers(0, 128, (2, 6)).astype(
            np.int32)
        m.prepare()
        m(q.tensor(ids))
        m.convert()
        outs[disp] = np.asarray(m.generate(ids, 8))
    assert np.array_equal(outs["dense"], outs["sparse"])


def test_dispatch_validation():
    from int8inferenceengine_tpu.layers import QuantMoE
    with pytest.raises(ValueError, match="dispatch"):
        QuantMoE(8, 16, 4, 2, dispatch="bogus")


def test_sparse_dispatch_weight_only_close():
    """Float serving modes through sparse dispatch: per-expert f32 dots
    may tile differently than the dense batched dot (the known float
    program-variant caveat), so allclose — the INT8 path is the
    bit-exact one."""
    from int8inferenceengine_tpu.layers import QuantMoE
    rng = np.random.default_rng(3)
    E, dim, hid = 8, 64, 128
    W = dict(
        router=rng.normal(scale=0.5, size=(E, dim)).astype(np.float32),
        gate_w=rng.normal(scale=0.1, size=(E, hid, dim)).astype(
            np.float32),
        up_w=rng.normal(scale=0.1, size=(E, hid, dim)).astype(
            np.float32),
        down_w=rng.normal(scale=0.1, size=(E, dim, hid)).astype(
            np.float32))
    x = rng.normal(size=(8, dim)).astype(np.float32)
    outs = {}
    for disp in ("dense", "sparse"):
        m = QuantMoE(dim, hid, E, 2,
                     config=QuantConfig(weight_only=True),
                     dispatch=disp)
        for k, v in W.items():
            getattr(m, "load_" + k)(v)
        m.prepare()
        m(q.tensor(x))
        m.convert()
        outs[disp] = np.asarray(m(q.tensor(x)).data)
    np.testing.assert_allclose(outs["dense"], outs["sparse"],
                               atol=1e-5, rtol=1e-5)
