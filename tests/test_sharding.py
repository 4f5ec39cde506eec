"""Multi-device tests on the 8-device virtual CPU mesh (conftest.py).

The reference has nothing distributed (SURVEY.md §2.4); these cover the
framework's new DP x TP capability: sharded execution must be bit-identical
to single-device execution, for FP32 and INT8, across mesh shapes.
"""

import jax
import numpy as np
import pytest

import int8inferenceengine_tpu as q
from int8inferenceengine_tpu import models
from int8inferenceengine_tpu.parallel.mesh import make_mesh


def _rand(shape, lo=-1.0, hi=1.0):
    return np.random.uniform(lo, hi, size=shape).astype(np.float32)


def _calibrated(name, batch):
    tm = models.torch_twin(name)
    mm = models.build(name)
    mm.load(tm.state_dict())
    shape = (batch,) + mm.INPUT_SHAPE
    mm.prepare()
    mm(q.tensor(_rand(shape)))
    mm.convert()
    return mm, shape


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_int8_sharded_equals_unsharded(mesh_shape):
    mm, shape = _calibrated("lenet", batch=16)
    x = _rand(shape)
    base = mm(q.tensor(x)).numpy()
    mm.shard(make_mesh(mesh_shape))
    out = mm(q.tensor(x)).numpy()
    np.testing.assert_array_equal(out, base)


def test_fp32_sharded_equals_unsharded():
    tm = models.torch_twin("lenet")
    mm = models.build("lenet")
    mm.load(tm.state_dict())
    x = _rand((16, 1, 28, 28))
    base = mm(q.tensor(x)).numpy()
    mm.shard(make_mesh((2, 4)))
    out = mm(q.tensor(x)).numpy()
    np.testing.assert_allclose(out, base, atol=1e-5)


def test_linear_only_model_tp():
    mm, shape = _calibrated("fc_mnist", batch=32)
    x = _rand(shape)
    base = mm(q.tensor(x)).numpy()
    mm.shard(make_mesh((1, 8)))  # fc 784->10: 10 % 8 != 0 -> replicated
    np.testing.assert_array_equal(mm(q.tensor(x)).numpy(), base)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (1, 8)])
def test_quantized_input_fast_path_sharded(mesh_shape):
    """Pre-quantized u8 ingest through a sharded module must match the
    sharded float path exactly (same in-program numerics, input quantize
    moved to the host)."""
    from int8inferenceengine_tpu.data import DataLoader

    mm, shape = _calibrated("lenet", batch=16)
    x = _rand(shape)
    cfg = mm.config
    mm.shard(make_mesh(mesh_shape))
    base = mm(q.tensor(x)).numpy()   # sharded float path
    dl = DataLoader(x, batch_size=16,
                    quantize_to=(cfg.input_scale, cfg.input_zero_point))
    (batch,) = list(dl)
    assert batch.quantized
    np.testing.assert_array_equal(mm(batch).numpy(), base)


def test_quantized_input_fast_path_sharded_overlap():
    """Same through the ring-TP overlap mode on a Linear-chain model."""
    from int8inferenceengine_tpu.data import DataLoader

    mm, shape = _calibrated("lenet", batch=16)
    x = _rand(shape)
    cfg = mm.config
    mm.shard(make_mesh((2, 4)), overlap=True)
    base = mm(q.tensor(x)).numpy()
    dl = DataLoader(x, batch_size=16,
                    quantize_to=(cfg.input_scale, cfg.input_zero_point))
    (batch,) = list(dl)
    np.testing.assert_array_equal(mm(batch).numpy(), base)


def test_mesh_shape_validation():
    with pytest.raises(ValueError, match="mesh shape"):
        make_mesh((3, 2))


def test_batch_not_divisible_raises_cleanly():
    mm, shape = _calibrated("lenet", batch=16)
    mm.shard(make_mesh((8, 1)))
    bad = _rand((6,) + mm.INPUT_SHAPE)  # 6 % 8 != 0
    with pytest.raises(Exception):
        mm(q.tensor(bad))


def test_host_prelayout_through_sharded_module():
    """Host space-to-depth ingest + shard_map: exact vs sharded float path."""
    from int8inferenceengine_tpu.data import DataLoader

    class Net(q.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = q.Conv2d(3, 16, 5, stride=2, padding=2)
            self.fc = q.Linear(16 * 8 * 8, 16)

        def forward(self, x):
            x = q.relu(self.conv1(x))
            return self.fc(x.reshape(-1, 16 * 8 * 8))

    rng = np.random.default_rng(5)
    m = Net()
    m.conv1.load_weight(rng.normal(0, 0.2, (16, 3, 5, 5)).astype(np.float32))
    m.conv1.load_bias(rng.normal(0, 0.1, (16,)).astype(np.float32))
    m.fc.load_weight(rng.normal(0, 0.05, (16, 1024)).astype(np.float32))
    m.fc.load_bias(rng.normal(0, 0.05, (16,)).astype(np.float32))
    m.prepare()
    m(q.tensor(rng.uniform(-1, 1, (8, 3, 16, 16)).astype(np.float32)))
    m.convert()

    x = rng.uniform(-1, 1, (8, 3, 16, 16)).astype(np.float32)
    cfg = m.config
    m.shard(make_mesh((2, 4)))
    base = m(q.tensor(x)).numpy()
    dl = DataLoader(x, batch_size=8, layout_for=m,
                    quantize_to=(cfg.input_scale, cfg.input_zero_point))
    (batch,) = list(dl)
    assert batch._ingest is not None
    np.testing.assert_array_equal(m(batch).numpy(), base)


def test_shard_before_convert_stays_sharded():
    """shard() -> calibrate -> convert() must keep executing sharded (the
    quantized params are re-placed on the mesh by convert())."""
    tm = models.torch_twin("lenet")
    ref = models.build("lenet")
    ref.load(tm.state_dict())
    x = _rand((16, 1, 28, 28))
    calib = _rand((16, 1, 28, 28))
    ref.prepare(); ref(q.tensor(calib)); ref.convert()
    base = ref(q.tensor(x)).numpy()

    mm = models.build("lenet")
    mm.load(tm.state_dict())
    mm.shard(make_mesh((2, 4)))          # before convert (FP32 serving)
    mm.prepare()
    mm(q.tensor(calib))
    mm.convert()
    assert mm._mesh is not None
    out = mm(q.tensor(x)).numpy()
    np.testing.assert_array_equal(out, base)
    # quantized params actually live on the mesh
    assert all(len(v.sharding.device_set) == 8
               for v in mm.conv1.params.values())


def test_text_models_shard_bit_exact():
    """DP/TP sharding covers the NLP models too (raw-id passthrough input):
    sharded forward == unsharded, bit for bit."""
    import numpy as np
    import int8inferenceengine_tpu as q
    from int8inferenceengine_tpu import models
    from int8inferenceengine_tpu.parallel.mesh import make_mesh

    for name in ("text_tiny", "gpt_tiny"):
        m = models.build(name)
        m.load(models.torch_twin(name).state_dict())
        t = m.INPUT_SHAPE[0]
        ids = np.random.default_rng(0).integers(
            0, 1000, (8, t)).astype(np.int32)
        m.prepare()
        m(q.tensor(ids))
        m.convert()
        want = m(q.tensor(ids)).numpy()
        m.shard(make_mesh((2, 4)))
        got = m(q.tensor(ids)).numpy()
        np.testing.assert_array_equal(got, want, err_msg=name)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_transformer_tp_decoder_bit_exact(mesh_shape):
    """Megatron-style transformer TP (Module.tp_roles): head-local
    attention (QKV column-parallel, outputs stay sharded), row-parallel
    proj/fc2 (s32 partials psummed before one requant).  Bit-exact vs
    the unsharded forward — integer addition is associative."""
    import numpy as np
    import int8inferenceengine_tpu as q
    from int8inferenceengine_tpu import models
    from int8inferenceengine_tpu.parallel.mesh import make_mesh

    dec = models.build("gpt_tiny", vocab_size=97, max_len=16, dim=128,
                       depth=2, heads=4)
    from int8inferenceengine_tpu.models.text_decoder import \
        torch_text_decoder
    dec.load(torch_text_decoder(vocab_size=97, max_len=16, dim=128,
                                depth=2, heads=4).state_dict())
    ids = np.random.default_rng(0).integers(0, 97, (4, 16)).astype(np.int32)
    dec.prepare(); dec(q.tensor(ids)); dec.convert()
    want = dec(q.tensor(ids)).numpy()
    dec.shard(make_mesh(mesh_shape))
    # the transformer roles actually engaged
    assert dec.wq1._tp_local and dec.wq1._tp_sharded
    assert dec.proj1._tp_row and dec.fc2_1._tp_row
    assert dec.fc1_1._tp_local
    got = dec(q.tensor(ids)).numpy()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_transformer_tp_vit_bit_exact(mesh_shape):
    """ViT under the same TP plan (image stem + cls head stay col/replicated)."""
    import numpy as np
    import int8inferenceengine_tpu as q
    from int8inferenceengine_tpu import models
    from int8inferenceengine_tpu.parallel.mesh import make_mesh

    vit = models.ViT(img_size=32, patch=8, dim=64, depth=2, heads=4,
                     num_classes=10)
    vit.load(models.torch_vit(img_size=32, patch=8, dim=64, depth=2,
                              heads=4, num_classes=10).state_dict())
    x = np.random.default_rng(1).uniform(
        -1, 1, (4, 3, 32, 32)).astype(np.float32)
    vit.prepare(); vit(q.tensor(x)); vit.convert()
    want = vit(q.tensor(x)).numpy()
    vit.shard(make_mesh(mesh_shape))
    got = vit(q.tensor(x)).numpy()
    np.testing.assert_array_equal(got, want)


def test_transformer_tp_head_fallback_bit_exact():
    """Heads not dividing the model axis: QKV fall back to gathered
    column-parallel, row-parallel MLP still engages; still bit-exact."""
    import numpy as np
    import int8inferenceengine_tpu as q
    from int8inferenceengine_tpu import models
    from int8inferenceengine_tpu.parallel.mesh import make_mesh

    vit = models.ViT(img_size=32, patch=8, dim=66, depth=1, heads=3,
                     num_classes=10)
    vit.load(models.torch_vit(img_size=32, patch=8, dim=66, depth=1,
                              heads=3, num_classes=10).state_dict())
    x = np.random.default_rng(2).uniform(
        -1, 1, (4, 3, 32, 32)).astype(np.float32)
    vit.prepare(); vit(q.tensor(x)); vit.convert()
    want = vit(q.tensor(x)).numpy()
    vit.shard(make_mesh((4, 2)))
    assert not vit.wq1._tp_local          # 3 heads don't divide 2
    assert vit.fc2_1._tp_row              # 264 % 2 == 0 -> row engaged
    got = vit(q.tensor(x)).numpy()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_tp_generate_bit_exact(mesh_shape):
    """generate() after shard(): the whole prefill+decode scan runs under
    shard_map — head-SHARDED u8 KV cache (each device holds only its
    heads' cache), row-parallel proj/fc2 psums inside the scan.  Greedy
    tokens are bit-identical to the unsharded run."""
    import numpy as np
    import int8inferenceengine_tpu as q
    from int8inferenceengine_tpu import models
    from int8inferenceengine_tpu.models.text_decoder import \
        torch_text_decoder
    from int8inferenceengine_tpu.parallel.mesh import make_mesh

    dec = models.build("gpt_tiny", vocab_size=97, max_len=48, dim=128,
                       depth=2, heads=4)
    dec.load(torch_text_decoder(vocab_size=97, max_len=48, dim=128,
                                depth=2, heads=4).state_dict())
    ids = np.random.default_rng(0).integers(0, 97, (4, 16)).astype(np.int32)
    dec.prepare(); dec(q.tensor(ids)); dec.convert()
    want = dec.generate(ids, 20)
    dec.shard(make_mesh(mesh_shape))
    got = dec.generate(ids, 20)
    np.testing.assert_array_equal(got, want)
    # sampling draws a valid independent stream per data shard
    s = dec.generate(ids, 6, temperature=0.8, top_k=20, seed=7)
    assert ((s >= 0) & (s < 97)).all()
